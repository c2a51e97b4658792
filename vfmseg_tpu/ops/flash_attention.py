"""Pallas TPU flash-attention (forward) with an XLA-recompute backward.

Replaces the reference's xformers ``memory_efficient_attention`` CUDA kernel
(rein/models/backbones/dino_layers/attention.py:72-90). ViT segmentation
workloads have short sequences (1025 tokens for a 512^2 crop at patch 16,
~2049 for a 512x1024 whole-image pass) and head_dim 64/80/128, so the whole
K/V stream for one (batch, head) fits comfortably in VMEM; the kernel tiles
queries on the grid and streams K/V blocks with an online-softmax accumulator.

The backward pass recomputes attention with plain XLA ops via jax.custom_vjp:
at these sequence lengths the full [B,H,Nq,Nk] probability tensor is small
(tens of MB), so a hand-written backward kernel is not the bottleneck —
training time is dominated by the 24-block matmuls.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfmseg_tpu.ops.attention import xla_attention

_NEG_INF = float("-inf")


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                      block_k: int):
    # refs are [1, 1, n, d] blocks of the [B, H, N, D] operands: the last two
    # dims (seq, head_dim) satisfy Mosaic's (8, 128)-or-full tiling rule
    q = q_ref[0, 0, :, :].astype(jnp.float32)  # [bq, d]
    block_q, d = q.shape
    kv_pad = k_ref.shape[2]
    num_kv = kv_pad // block_k

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    _, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0, 0, :, :] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_forward(q, k, v, scale: float) -> jax.Array:
    b, nq, h, d = q.shape
    nk = k.shape[1]
    block_q = min(512, _round_up(nq, 8))
    block_k = min(512, _round_up(nk, 8))
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)
    # [B, N, H, D] -> [B, H, N_pad, D]: blocks end in (seq, head_dim), which
    # satisfies Mosaic tiling; XLA fuses the transpose into the producer
    qp = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))
    kp = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))

    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, kv_len=nk, block_k=block_k
    )
    grid = (b, h, nq_pad // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_pad * nk_pad * d,
            bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
    )(qp, kp, vp)
    return out[:, :, :nq].transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale: float):
    return _flash_forward(q, k, v, scale)


def _flash_fwd_rule(q, k, v, scale: float):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_bwd_rule(scale: float, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: xla_attention(q_, k_, v_, scale=scale), q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, scale: Optional[float] = None
) -> jax.Array:
    """Flash attention over [B, N, H, D] tensors (no mask/bias support)."""
    if q.ndim != 4:
        raise NotImplementedError("flash_attention expects [B, N, H, D]")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, float(scale))
