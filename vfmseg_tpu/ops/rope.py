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
