"""Window partitioning for SAM/ViTDet-style windowed attention.

Reference: rein/models/backbones/sam_vit.py:301-357 (partition pads
bottom/right to a window multiple; unpartition crops back) and the
decomposed relative position helpers (:360-432).
All shapes static; the pad/crop fuses into neighboring ops under XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jax.Array, ws: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """[B, H, W, C] -> [B*nH*nW, ws, ws, C], padded spatial size."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(x: jax.Array, ws: int, pad_hw: Tuple[int, int],
                       hw: Tuple[int, int]) -> jax.Array:
    """Inverse of window_partition, cropping padding."""
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


@functools.lru_cache(maxsize=64)
def relative_coords(q_size: int, k_size: int) -> np.ndarray:
    """Static [q_size, k_size] index table into a rel-pos row (sam_vit.py
    get_rel_pos coordinate math, incl. the short-side scaling)."""
    q = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    return ((q - k) + (k_size - 1) * max(q_size / k_size, 1.0)).astype(np.int32)


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select (and if needed linearly resize) rel-pos rows for the given
    extent (sam_vit.py:355-390: torch F.interpolate mode='linear')."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        from vfmseg_tpu.ops.resize import _interp_matrix

        mat = jnp.asarray(
            _interp_matrix(rel_pos.shape[0], max_rel_dist, "bilinear", False, None))
        rel_pos = mat @ rel_pos.astype(jnp.float32)
    return jnp.take(rel_pos, jnp.asarray(relative_coords(q_size, k_size)), axis=0)


def decomposed_rel_pos_bias(q: jax.Array, rel_pos_h: jax.Array,
                            rel_pos_w: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Attention bias [B, heads, N, N] from decomposed rel-pos (sam_vit.py
    add_decomposed_rel_pos, :392-432). q: [B, N, heads, hd], N = h*w."""
    h, w = hw
    b, n, heads, hd = q.shape
    rh = get_rel_pos(h, h, rel_pos_h).astype(q.dtype)  # [h, h, hd]
    rw = get_rel_pos(w, w, rel_pos_w).astype(q.dtype)  # [w, w, hd]
    rq = q.reshape(b, h, w, heads, hd)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", rq, rh)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", rq, rw)
    bias = rel_h[..., :, None] + rel_w[..., None, :]
    return bias.reshape(b, heads, n, n)


def decomposed_rel_pos_bias_hm(q: jax.Array, rel_pos_h: jax.Array,
                               rel_pos_w: jax.Array,
                               hw: Tuple[int, int]) -> jax.Array:
    """Same bias from a head-major q [B, heads, N, hd] (N = h*w)."""
    b, heads, n, _hd = q.shape
    rel_h, rel_w = decomposed_rel_pos_terms_hm(q, rel_pos_h, rel_pos_w, hw)
    h, w = hw
    bias = (rel_h.reshape(b, heads, h, w, h)[..., :, None]
            + rel_w.reshape(b, heads, h, w, w)[..., None, :])
    return bias.reshape(b, heads, n, n)


def decomposed_rel_pos_terms_hm(q: jax.Array, rel_pos_h: jax.Array,
                                rel_pos_w: jax.Array,
                                hw: Tuple[int, int]):
    """The two k-separable terms of the decomposed rel-pos bias:
    rel_h [B, heads, N, h] and rel_w [B, heads, N, w], where
    bias[..., q, kh*w + kw] = rel_h[..., q, kh] + rel_w[..., q, kw].

    Adding these onto the attention logits viewed as [..., N, kh, kw]
    (a free minor-dim split) skips materializing the [B, heads, N, N]
    bias — on v5e the 6D add + transpose-reshape that builds it measured
    ~23 ms per SAM-H global block at 12x512^2 crops."""
    h, w = hw
    b, heads, n, hd = q.shape
    rh = get_rel_pos(h, h, rel_pos_h).astype(q.dtype)  # [h, h, hd]
    rw = get_rel_pos(w, w, rel_pos_w).astype(q.dtype)  # [w, w, hd]
    rq = q.reshape(b, heads, h, w, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rh).reshape(b, heads, n, h)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rw).reshape(b, heads, n, w)
    return rel_h, rel_w
