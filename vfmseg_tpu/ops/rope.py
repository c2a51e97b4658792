"""2D axial rotary position embedding (EVA02's VisionRotaryEmbeddingFast).

Reference behavior (rein/models/backbones/eva_02.py:119-161): per-axis
frequencies 1/theta^(2i/d) over half the head dim; positions
t = arange(ft)/ft * pt_seq_len; per-dim frequency vector = concat of the
row-axis and column-axis halves, each entry repeated twice; rotation
x*cos + rotate_half(x)*sin with rotate_half acting on consecutive pairs.
Applied to q/k of patch tokens only (cls bypasses, eva_02.py:362-369).

Tables are built in numpy at trace time (static per (gh, gw)) — they land
as XLA constants fused into the attention prologue.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def rope_2d_tables(gh: int, gw: int, head_dim: int, pt_seq_len: int = 16,
                   intp_freq: bool = True, theta: float = 10000.0):
    """cos/sin tables [gh*gw, head_dim] (numpy, fp32)."""
    half = head_dim // 2  # per-axis rotary dim ("dim" in the reference)
    inv = 1.0 / theta ** (np.arange(0, half, 2, dtype=np.float64)[: half // 2] / half)

    def axis_freqs(n: int) -> np.ndarray:
        t = np.arange(n, dtype=np.float64)
        t = t / n * pt_seq_len if intp_freq else t
        f = np.outer(t, inv)                       # [n, half//2]
        return np.repeat(f, 2, axis=-1)            # [n, half]

    fy = axis_freqs(gh)
    fx = axis_freqs(gw)
    grid = np.concatenate(
        [np.broadcast_to(fy[:, None, :], (gh, gw, half)),
         np.broadcast_to(fx[None, :, :], (gh, gw, half))], axis=-1
    ).reshape(gh * gw, head_dim)
    return np.cos(grid).astype(np.float32), np.sin(grid).astype(np.float32)


def rotate_half(x: jax.Array) -> jax.Array:
    """Pairwise rotation on consecutive dims: (x0,x1,...) -> (-x1,x0,...)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


@functools.lru_cache(maxsize=8)
def _rotate_half_matrix(d: int) -> np.ndarray:
    """[d, d] signed permutation with x @ R == rotate_half(x)."""
    R = np.zeros((d, d), np.float32)
    for i in range(d // 2):
        R[2 * i + 1, 2 * i] = -1.0
        R[2 * i, 2 * i + 1] = 1.0
    return R


def rotate_half_mxu(x: jax.Array) -> jax.Array:
    """rotate_half as a matmul with a constant +-1 permutation matrix.

    Stride-2 lane slicing + stack is vreg-shuffle work the TPU VPU does
    badly (measured ~1.5 ms per EVA02-L block at 12x1025 tokens); the MXU
    does the same shuffle as a [*, d] x [d, d] matmul for ~0.02 ms.
    Numerically exact: entries are +-1 and each output lane is a single
    product, so no accumulation rounding occurs."""
    d = x.shape[-1]
    R = jnp.asarray(_rotate_half_matrix(d), x.dtype)
    return jax.lax.dot_general(
        x, R, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., N, D] patch tokens; cos/sin: [N, D]."""
    return x * cos + rotate_half(x) * sin


# ---------------------------------------------------------------------------
# Evens|odds permuted convention — the in-kernel RoPE layout.
#
# rotate_half pairs consecutive dims (2i, 2i+1). Inside the fused-qkv flash
# kernel each head is a contiguous 64-lane slice, so a stride-2 lane shuffle
# would be required per block — vreg work the VPU does badly (see
# rotate_half_mxu). Instead the q/k PROJECTION COLUMNS are permuted once at
# the weight level to [evens | odds] within each head: pair partners sit a
# fixed d/2 lanes apart and the shuffle becomes one contiguous half-swap
# (concat of two 32-lane slices). Scores are invariant because q and k
# columns permute identically (q.k is a sum over dims); v keeps the natural
# layout so attention output and proj are untouched.
#     x_rot = x * cosP + halfswap(x) * sinP
#     cosP[:, j] = cos[:, 2*(j mod d/2)]      (cos is pair-constant)
#     sinP[:, j] = -sin[:, 2j]        (j <  d/2: even slots, -x_odd * sin)
#                  +sin[:, 2(j-d/2)]  (j >= d/2: odd  slots, +x_even * sin)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def evens_odds_perm(num_heads: int, head_dim: int) -> np.ndarray:
    """Column permutation P with W[:, P] mapping each head's dims to
    [evens | odds] order (applied to q/k projection weights + biases)."""
    d = head_dim
    cols = np.empty(num_heads * d, np.int64)
    for h in range(num_heads):
        base = h * d
        cols[base:base + d // 2] = base + 2 * np.arange(d // 2)
        cols[base + d // 2:base + d] = base + 2 * np.arange(d // 2) + 1
    return cols


def permuted_rope_tables(cos, sin):
    """cos/sin [N, d] (pairwise convention, identity cls rows) ->
    (cosP, sinP) [N, d] for the evens|odds half-swap formulation."""
    d = cos.shape[-1]
    xp = np if isinstance(cos, np.ndarray) else jnp
    even = 2 * np.arange(d // 2)
    idx = np.concatenate([even, even + 1])
    cosP = cos[:, idx]
    sinP = xp.concatenate([-sin[:, even], sin[:, even + 1]], axis=-1)
    return cosP, sinP


def half_swap(x):
    """Partner lookup in the evens|odds layout: swap the two halves of the
    last axis (x_rot = x*cosP + half_swap(x)*sinP)."""
    d = x.shape[-1]
    return jnp.concatenate([x[..., d // 2:], x[..., :d // 2]], axis=-1)


def apply_rope_permuted(x, cosP, sinP):
    """x: [..., N, d] in the evens|odds permuted layout."""
    return x * cosP + half_swap(x) * sinP
