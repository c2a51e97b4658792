"""Pallas TPU flash attention: forward + backward kernels.

Replaces the reference's xformers ``memory_efficient_attention`` CUDA kernel
(rein/models/backbones/dino_layers/attention.py:72-90). ViT segmentation
workloads have short sequences (1025 tokens for a 512^2 crop at patch 16,
~2049 for a 512x1024 whole-image pass) and head_dim 64/80/128, so the whole
K/V stream for one (batch, head) fits comfortably in VMEM; the forward tiles
queries on the grid and streams K/V blocks with an online-softmax
accumulator, also emitting the per-row log-sum-exp.

The backward is the standard two-kernel flash scheme: dQ on a query-block
grid and dK/dV on a kv-block grid, both recomputing probabilities from the
saved LSE so no [N, N] tensor ever materializes in HBM.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")

# Per-kernel scoped-VMEM budget: the fewest-largest block policy puts two
# ~4.3 MB fp32 score tiles (plus their bf16 p casts and double-buffered kv
# DMA windows) live at once, which exceeds the backend's default 16 MB
# scoped-vmem compile limit at the stage-1 shapes (observed: "Scoped
# allocation with size 19.98M and limit 16.00M exceeded"). v5e has 128 MB
# of VMEM per core; 100 MB leaves headroom for the runtime's own buffers.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# sequences up to this length run as ONE block (measured fastest at ViT
# crop lengths: per-cell fixed costs dominate small tiles; a 1032^2 fp32
# score tile is ~4.3 MB, comfortably in VMEM). Longer sequences split into
# the FEWEST blocks of at most this size (not the default 512 cap): at the
# stage-1 length 2049, two 1032-blocks measured 69.5 TF/s vs 59.2 for the
# five 416-blocks the old ceil(n/512) policy produced (v5e sweep,
# tools/bench_kernels.py --sweep) — bigger tiles amortize the per-block
# softmax bookkeeping and keep the MXU matmuls near their wide-shape rate.
_SINGLE_BLOCK_MAX = 1100
_MULTI_BLOCK_TARGET = 1032


def _pick_block(n: int, max_block: int, allow_single: bool = True) -> int:
    """Smallest 8-aligned block covering n in the fewest blocks of size
    <= max(max_block, _SINGLE_BLOCK_MAX) — minimizes padded softmax tiles
    (the kernel's VPU-bound cost) while keeping tiles as large as VMEM
    allows (fewer, larger blocks measured faster; see _SINGLE_BLOCK_MAX)."""
    if allow_single:
        if n <= _SINGLE_BLOCK_MAX:
            return _round_up(n, 8)
        max_block = max(max_block, _MULTI_BLOCK_TARGET)
    num_blocks = -(-n // max_block)
    return _round_up(-(-n // num_blocks), 8)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(*refs, scale: float, kv_len: int, block_k: int,
                has_bias: bool = False, with_lse: bool = True):
    lse_ref = None
    if has_bias:
        if with_lse:
            q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref = refs
        else:
            q_ref, k_ref, v_ref, bias_ref, o_ref = refs
    else:
        if with_lse:
            q_ref, k_ref, v_ref, o_ref, lse_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
        bias_ref = None
    # refs are [1, 1, n, d] blocks of [B, H, N, D] operands: the last two
    # dims (seq, head_dim) satisfy Mosaic's (8, 128)-or-full tiling rule.
    # Matmuls run in the OPERAND dtype with fp32 accumulation
    # (preferred_element_type) — upcasting bf16 operands to fp32 first would
    # run the MXU at the fp32 rate, several times slower. The softmax state
    # (m/l) stays fp32. Padding is masked only in the FINAL kv block; scale
    # is applied to the fp32 score tile.
    q = q_ref[0, 0, :, :]                # [bq, d], operand dtype
    block_q, d = q.shape
    kv_pad = k_ref.shape[2]
    num_kv = kv_pad // block_k
    has_tail = kv_len < kv_pad
    # inference primal (no lse consumer): fold the softmax denominator into
    # the AV matmul as a ones-column of v — the fp32 p tile, its row-sum
    # pass, and the p->bf16 cast pass all disappear (p is written once, in
    # the operand dtype, and read once, by the MXU). l accumulates in the
    # matmul's fp32 accumulator; only its source rounding (operand-dtype p)
    # differs from the exact kernel, ~2^-8 relative for bf16 — below the
    # bf16 output quantization. Measured ~28 -> ~16 bytes of VMEM traffic
    # per score element.
    fused_l = lse_ref is None
    # inference primal: no-max exp2 softmax (see _fwd_kernel_qkv) — the
    # row-max reduction pass and the acc rescale are pure VPU overhead at
    # fp32's >2^40 exponent headroom over trained attention logits. All the
    # elementwise score ops (scale, +bias, *log2e) fuse into the one
    # pre-exp2 sweep; only the max pass and corr multiply disappear.
    no_max = fused_l and os.environ.get(
        "VFMSEG_FLASH_SAFE_SOFTMAX", "0") != "1"

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d + 1 if fused_l else d), dtype=jnp.float32)

    def step(j, carry, masked):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        if masked:
            # tail rows past kv_len hold garbage (Mosaic-padded blocks in the
            # no-HBM-pad path can be NaN/inf): zero them so they cannot
            # poison the matmuls (0 * NaN = NaN would survive the s-mask)
            kv_row = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, k.shape, 0)
            k = jnp.where(kv_row < kv_len, k, 0)
            v = jnp.where(kv_row < kv_len, v, 0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk] fp32
        if bias_ref is not None:
            s = s + bias_ref[0, 0, :, pl.ds(j * block_k, block_k)].astype(
                jnp.float32)
        if masked:
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        if no_max:
            p = jnp.exp2(s * _LOG2E)
            v_aug = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
            acc_new = acc + jax.lax.dot_general(
                p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m, l, acc_new
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        if fused_l:
            # masked kv rows contribute p=0, so the ones column is safe
            v_aug = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
            acc_new = acc * corr + jax.lax.dot_general(
                p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc_new
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    # unrolled (static trip count): lets Mosaic software-pipeline the next
    # block's score matmul under the current block's softmax VPU work
    carry = (m0, l0, acc0)
    for j in range(num_kv - 1 if has_tail else num_kv):
        carry = step(j, carry, masked=False)
    if has_tail:
        carry = step(num_kv - 1, carry, masked=True)
    m, l, acc = carry
    if fused_l:
        safe_l = jnp.maximum(acc[:, d:], 1e-37)
        o_ref[0, 0, :, :] = (acc[:, :d] / safe_l).astype(o_ref.dtype)
        return
    safe_l = jnp.maximum(l, 1e-37)
    o_ref[0, 0, :, :] = (acc / safe_l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0, 0, :, :] = m + jnp.log(safe_l)  # [bq, 1]


def _blocks(nq: int, nk: int, has_bias: bool = False):
    # an explicit env override wins over the single-block heuristic (else
    # block-size sweeps below _SINGLE_BLOCK_MAX tokens would silently
    # measure identical kernels)
    explicit = any(k in os.environ for k in (
        "VFMSEG_FLASH_BLOCK", "VFMSEG_FLASH_BLOCK_Q", "VFMSEG_FLASH_BLOCK_K"))
    max_block = int(os.environ.get("VFMSEG_FLASH_BLOCK", "512"))
    max_q = int(os.environ.get("VFMSEG_FLASH_BLOCK_Q", max_block))
    max_k = int(os.environ.get("VFMSEG_FLASH_BLOCK_K", max_block))
    if has_bias:
        # the bias/dbias tiles share VMEM with the score tiles — keep query
        # blocks small enough that (bias + dbias + s + p) stays under ~8 MB
        max_q = min(max_q, 256)
    allow_single = not has_bias and not explicit
    block_q = _pick_block(nq, max_q, allow_single=allow_single)
    block_k = _pick_block(nk, max_k, allow_single=allow_single)
    return block_q, block_k


def _flash_forward(q, k, v, scale: float, bias=None, with_lse: bool = True):
    """[B, N, H, D] inputs (+optional [B, H, Nq, Nk] bias) -> (out
    [B, N, H, D], lse [B, H, Nq_pad, 1] | None, padded residuals)."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    # minimal-padding tiling: the kernel is VPU-bound on the [bq, bk] softmax
    # tiles, so padded score elements are pure waste (seq 1025 padded to a
    # 512 block costs 1536^2/1032^2 = 2.2x the exps); override the max block
    # for experiments via VFMSEG_FLASH_BLOCK[_Q|_K]
    block_q, block_k = _blocks(nq, nk, has_bias=bias is not None)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)
    # [B, N, H, D] -> [B, H, N_pad, D]; XLA fuses the transpose upstream
    qp = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))
    kp = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
    biasp = None
    if bias is not None:
        biasp = jnp.pad(bias, ((0, 0), (0, 0), (0, nq_pad - nq),
                               (0, nk_pad - nk)))

    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=nk,
                               block_k=block_k, has_bias=bias is not None,
                               with_lse=with_lse)
    grid = (b, h, nq_pad // block_q)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qp, kp, vp]
    if biasp is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, block_q, nk_pad),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM))
        operands.append(biasp)
    o_spec = pl.BlockSpec((1, 1, block_q, d),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct(qp.shape, q.dtype)
    if with_lse:
        out_specs = (o_spec,
                     pl.BlockSpec((1, 1, block_q, 1),
                                  lambda bi, hi, qi: (bi, hi, qi, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (o_shape,
                     jax.ShapeDtypeStruct((b, h, nq_pad, 1), jnp.float32))
    else:
        out_specs, out_shape = o_spec, o_shape
    res = pl.pallas_call(
        kernel,
        compiler_params=_VMEM_LIMIT,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_pad * nk_pad * d,
            bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
    )(*operands)
    out, lse = res if with_lse else (res, None)
    return out[:, :, :nq].transpose(0, 2, 1, 3), lse, (qp, kp, vp, biasp)


# --------------------------------------------------------------------------
# backward: dQ kernel (query-block grid) and dK/dV kernel (kv-block grid)
# --------------------------------------------------------------------------

def _bwd_dq_kernel(*refs, scale: float, kv_len: int, block_k: int,
                   has_bias: bool = False, exp2_scale_q: bool = False):
    if has_bias:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
         dq_ref, dbias_ref) = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
        bias_ref = dbias_ref = None
    q = q_ref[0, 0, :, :]                # operand dtype
    do = do_ref[0, 0, :, :]
    lse = lse_ref[0, 0, :, :]            # [bq, 1] fp32
    delta = delta_ref[0, 0, :, :]        # [bq, 1] fp32
    block_q, d = q.shape
    kv_pad = k_ref.shape[2]
    num_kv = kv_pad // block_k
    has_tail = kv_len < kv_pad
    # exp2_scale_q mirrors the exp2-folded forward (_fwd_kernel_qkv): the
    # score matmul uses the SAME bf16-rounded pre-scaled q, so recomputed
    # probabilities match the forward's bit-wise. Only the score matmul
    # takes qs; dq/dk math stays in original-q units.
    qs = ((q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
          if exp2_scale_q else q)

    def step(j, dq, masked):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        if masked:
            # zero garbage tail rows (see _fwd_kernel): dp columns past
            # kv_len would otherwise be NaN and 0 * NaN survives into ds
            kv_row = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, k.shape, 0)
            k = jnp.where(kv_row < kv_len, k, 0)
            v = jnp.where(kv_row < kv_len, v, 0)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if not exp2_scale_q:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0, :, pl.ds(j * block_k, block_k)].astype(
                jnp.float32)
        if masked:
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        if exp2_scale_q:
            p = jnp.exp2(s - lse * _LOG2E)   # rows with lse=+inf give p=0
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds_raw = p * (dp - delta)        # == dL/ds == dL/dbias
        if dbias_ref is not None:
            dbias_ref[0, 0, :, pl.ds(j * block_k, block_k)] = ds_raw.astype(
                dbias_ref.dtype)
        ds = (ds_raw * scale).astype(k.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq = jnp.zeros((block_q, d), jnp.float32)
    for j in range(num_kv - 1 if has_tail else num_kv):
        dq = step(j, dq, masked=False)
    if has_tail:
        dq = step(num_kv - 1, dq, masked=True)
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale: float, q_len: int, block_q: int,
                    has_bias: bool = False, exp2_scale_q: bool = False):
    if has_bias:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
         dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref) = refs
        bias_ref = None
    k = k_ref[0, 0, :, :]                        # [bk, d], operand dtype
    v = v_ref[0, 0, :, :]
    block_k, d = k.shape
    q_pad = q_ref.shape[2]
    num_q = q_pad // block_q
    # query tail rows beyond q_len carry garbage (Mosaic block padding in the
    # no-HBM-pad path) or lse=+inf (padded-array path): mask their
    # probabilities to zero either way (where() also scrubs NaNs).
    has_q_tail = q_len < q_pad

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :]
        if has_q_tail:
            # garbage tail rows can hold NaN/inf: multiplying by zero is not
            # enough (0*NaN = NaN), so zero q/do tail rows before they enter
            # a matmul accumulation (dk sums ds^T q, dv sums p^T do)
            qd_row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, q.shape, 0)
            q = jnp.where(qd_row < q_len, q, 0)
            do = jnp.where(qd_row < q_len, do, 0)
        # see _bwd_dq_kernel: exp2_scale_q recomputes p from the forward's
        # bf16-rounded pre-scaled q; dk still accumulates against original q
        qs = ((q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
              if exp2_scale_q else q)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bq, bk] fp32
        if not exp2_scale_q:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(
                jnp.float32)
        p = jnp.exp2(s - lse * _LOG2E) if exp2_scale_q else jnp.exp(s - lse)
        if has_q_tail:
            # lse/delta tail entries are still garbage: scrub p and ds
            row = i * block_q + jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
            p = jnp.where(row < q_len, p, 0.0)
        dv_new = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds_raw = p * (dp - delta)
        if has_q_tail:
            ds_raw = jnp.where(row < q_len, ds_raw, 0.0)
        ds = (ds_raw * scale).astype(q.dtype)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_new, dv_new

    carry = (jnp.zeros((block_k, d), jnp.float32),
             jnp.zeros((block_k, d), jnp.float32))
    for i in range(num_q):
        carry = body(i, carry)
    dk, dv = carry
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _flash_backward(qp, kp, vp, lse, out, g, scale: float, nq: int, nk: int,
                    biasp=None):
    """Padded [B, H, N_pad, D] residuals + grad -> (dq, dk, dv[, dbias])
    unpadded [B, N, H, D]."""
    b, h, nq_pad, d = qp.shape
    nk_pad = kp.shape[2]
    # same deterministic tiling as the forward (nq_pad/nk_pad are multiples
    # of the forward's picked blocks, so these divide them exactly)
    has_bias = biasp is not None
    block_q, block_k = _blocks(nq, nk, has_bias=has_bias)

    gp = jnp.pad(g.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))
    # delta = rowsum(dO * O) (padded rows -> 0); lse padded rows -> +inf so
    # the recomputed probabilities vanish
    delta = jnp.sum(gp.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                    keepdims=True)
    row_ids = jnp.arange(nq_pad)[None, None, :, None]
    lse = jnp.where(row_ids < nq, lse, jnp.inf)

    common_specs = [
        pl.BlockSpec((1, 1, nq_pad, d), lambda bi, hi, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),  # q (full)
        pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),  # k (full)
        pl.BlockSpec((1, 1, nk_pad, d), lambda bi, hi, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),  # v (full)
        pl.BlockSpec((1, 1, nq_pad, d), lambda bi, hi, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),  # do (full)
        pl.BlockSpec((1, 1, nq_pad, 1), lambda bi, hi, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),  # lse (full)
        pl.BlockSpec((1, 1, nq_pad, 1), lambda bi, hi, i: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),  # delta (full)
    ]

    dq_specs = list(common_specs)
    dq_specs[0] = pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, i: (bi, hi, i, 0),
                               memory_space=pltpu.VMEM)
    dq_specs[3] = pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, i: (bi, hi, i, 0),
                               memory_space=pltpu.VMEM)
    dq_specs[4] = pl.BlockSpec((1, 1, block_q, 1),
                               lambda bi, hi, i: (bi, hi, i, 0),
                               memory_space=pltpu.VMEM)
    dq_specs[5] = pl.BlockSpec((1, 1, block_q, 1),
                               lambda bi, hi, i: (bi, hi, i, 0),
                               memory_space=pltpu.VMEM)
    dq_operands = [qp, kp, vp, gp, lse, delta]
    dq_out_specs = pl.BlockSpec((1, 1, block_q, d),
                                lambda bi, hi, i: (bi, hi, i, 0),
                                memory_space=pltpu.VMEM)
    dq_out_shape = jax.ShapeDtypeStruct(qp.shape, qp.dtype)
    if has_bias:
        dq_specs.append(
            pl.BlockSpec((1, 1, block_q, nk_pad),
                         lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM))
        dq_operands.append(biasp)
        dq_out_specs = (dq_out_specs,
                        pl.BlockSpec((1, 1, block_q, nk_pad),
                                     lambda bi, hi, i: (bi, hi, i, 0),
                                     memory_space=pltpu.VMEM))
        dq_out_shape = (dq_out_shape,
                        jax.ShapeDtypeStruct(biasp.shape, jnp.float32))
    dq_out = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=nk,
                          block_k=block_k, has_bias=has_bias),
        compiler_params=_VMEM_LIMIT,
        grid=(b, h, nq_pad // block_q),
        in_specs=dq_specs,
        out_specs=dq_out_specs,
        out_shape=dq_out_shape,
    )(*dq_operands)
    dbias = None
    if has_bias:
        dq, dbias = dq_out
        dbias = dbias[:, :, :nq, :nk]
    else:
        dq = dq_out

    dkv_specs = list(common_specs)
    dkv_specs[1] = pl.BlockSpec((1, 1, block_k, d),
                                lambda bi, hi, i: (bi, hi, i, 0),
                                memory_space=pltpu.VMEM)
    dkv_specs[2] = pl.BlockSpec((1, 1, block_k, d),
                                lambda bi, hi, i: (bi, hi, i, 0),
                                memory_space=pltpu.VMEM)
    dkv_operands = [qp, kp, vp, gp, lse, delta]
    if has_bias:
        dkv_specs.append(
            pl.BlockSpec((1, 1, nq_pad, block_k),
                         lambda bi, hi, i: (bi, hi, 0, i),
                         memory_space=pltpu.VMEM))
        dkv_operands.append(biasp)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_len=nq,
                          block_q=block_q, has_bias=has_bias),
        compiler_params=_VMEM_LIMIT,
        grid=(b, h, nk_pad // block_k),
        in_specs=dkv_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(kp.shape, kp.dtype),
                   jax.ShapeDtypeStruct(vp.shape, vp.dtype)),
    )(*dkv_operands)

    dq = dq[:, :, :nq].transpose(0, 2, 1, 3)
    dk = dk[:, :, :nk].transpose(0, 2, 1, 3)
    dv = dv[:, :, :nk].transpose(0, 2, 1, 3)
    if has_bias:
        return dq, dk, dv, dbias
    return dq, dk, dv


# --------------------------------------------------------------------------
# head-major ([B, H, N, D]) no-HBM-pad path
#
# The [B, N, H, D] entry point below pays three HBM passes per operand
# (slice out of the fused qkv, transpose to head-major, pad to the block
# grid) — measured at ~32% of ViT-L stage-1 device time. This path takes
# operands already in head-major layout (the ViT produces them there via
# per-slot einsums) and skips the explicit padding entirely: the grid
# ceil-divides the query length and the kv block is rounded up, letting
# Mosaic pad the edge blocks in VMEM. Tail garbage is masked in-kernel
# (kv via kv_len in the forward/dq kernels, q via q_len in the dkv kernel).
# --------------------------------------------------------------------------

def _flash_forward_hm(q, k, v, scale: float, with_lse: bool = True):
    """[B, H, N, D] unpadded -> (out [B, H, N, D], lse [B, H, N, 1]|None)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    block_q, block_k = _blocks(nq, nk)
    kvp = _round_up(nk, block_k)

    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=nk,
                               block_k=block_k, has_bias=False,
                               with_lse=with_lse)
    grid = (b, h, pl.cdiv(nq, block_q))
    o_spec = pl.BlockSpec((1, 1, block_q, d),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if with_lse:
        out_specs = (o_spec,
                     pl.BlockSpec((1, 1, block_q, 1),
                                  lambda bi, hi, qi: (bi, hi, qi, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (o_shape,
                     jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32))
    else:
        out_specs, out_shape = o_spec, o_shape
    res = pl.pallas_call(
        kernel,
        compiler_params=_VMEM_LIMIT,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, v)
    return res if with_lse else (res, None)


def _flash_backward_hm(q, k, v, lse, out, g, scale: float,
                       exp2_scale_q: bool = False):
    """Unpadded [B, H, N, D] residuals + grad -> (dq, dk, dv).

    exp2_scale_q: True when the FORWARD ran the exp2/pre-scaled-q kernel
    (_fwd_kernel_qkv) so the recomputed probabilities match it bit-wise."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    block_q, block_k = _blocks(nq, nk)
    kvp = _round_up(nk, block_k)
    qp = _round_up(nq, block_q)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                    keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=nk,
                          block_k=block_k, has_bias=False,
                          exp2_scale_q=exp2_scale_q),
        compiler_params=_VMEM_LIMIT,
        grid=(b, h, pl.cdiv(nq, block_q)),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi, i: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi, i: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),   # do
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),   # delta
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, i: (bi, hi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_len=nq,
                          block_q=block_q, has_bias=False,
                          exp2_scale_q=exp2_scale_q),
        compiler_params=_VMEM_LIMIT,
        grid=(b, h, pl.cdiv(nk, block_k)),
        in_specs=[
            pl.BlockSpec((1, 1, qp, d), lambda bi, hi, i: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),   # q (full, block-padded)
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((1, 1, qp, d), lambda bi, hi, i: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),   # do
            pl.BlockSpec((1, 1, qp, 1), lambda bi, hi, i: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((1, 1, qp, 1), lambda bi, hi, i: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),   # delta
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


# --------------------------------------------------------------------------
# fused-qkv direct path: [B, N, 3*H*D] -> [B, H, N, D]
#
# The qkv projection is fastest as ONE [E, 3HD] matmul in the natural
# [B, N, 3HD] output layout (per-slot head-major einsums force XLA into
# transposed dots + layout copies, measured ~0.5 ms/block slower on v5e).
# This kernel consumes that tensor with zero HBM-side layout work: the SAME
# array is passed three times with lane-offset index maps (q at lane-block
# h2, k at H/2 + h2, v at H + h2). Mosaic requires lane blocks of 128, so a
# grid cell covers a PAIR of heads and splits the two 64-lane halves
# in-register.
# --------------------------------------------------------------------------

_LOG2E = 1.4426950408889634


def _fwd_kernel_qkv(*refs, scale: float, kv_len: int, block_k: int,
                    head_dim: int, with_lse: bool = True,
                    token_major: bool = False):
    # two score-tile VPU savings over _fwd_kernel: scale (and log2 e) are
    # folded into q before the score matmul (d muls/row instead of bk), and
    # the softmax runs in exp2 space. When with_lse is False (the inference
    # primal — nobody reads the lse) the [bq, 1] lse store is skipped
    # entirely: sub-lane-width stores are the slowest part of this kernel
    # (~0.8 ms of a 3.3 ms call at refine shapes, measured on v5e).
    # token_major (primal only): the two head halves are concatenated
    # in-register and stored as ONE [bq, 128] lane-aligned tile of a
    # [B, N, H*D] output — the proj matmul then consumes attention output
    # with zero layout ops (the head-major form costs a transpose+reshape
    # relayout pass per block, ~1 ms at refine shapes on v5e).
    if with_lse:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        lse_ref = None
    qp = q_ref[0, :, :]                    # [bq, 2*head_dim]
    block_q = qp.shape[0]
    kv_pad = k_ref.shape[1]
    num_kv = kv_pad // block_k
    has_tail = kv_len < kv_pad
    # see _fwd_kernel: the inference primal folds l into the AV matmul via a
    # ones-column (no fp32 p store / row-sum / cast passes)
    fused_l = lse_ref is None
    # Inference primal only: drop the running max ENTIRELY and take
    # p = exp2(s) raw. This kernel is VPU-bound at head_dim 64 (the K=64 /
    # N<=65 matmuls pad MXU tiles 2x, so ~4 VPU passes per score element set
    # the 35-41 TF/s ceiling) — removing the row-max pass and the
    # online-rescale carry cuts the softmax to one fused exp2+cast pass.
    # Safety: exp2 args are scale*log2(e)*q.k <= ~1.44*|logit|; fp32
    # overflows at exp2(128), and l (the ones-column sum of <=2176 terms)
    # at exp2(~116) — trained ViT attention logits peak around 30-50
    # natural (~43-72 in exp2 space), a >2^40 margin. Masked tail columns
    # keep s = -inf, so exp2(s) = 0 exactly as before. The with_lse
    # training path keeps the exact online softmax; set
    # VFMSEG_FLASH_SAFE_SOFTMAX=1 to restore it for the primal too.
    no_max = fused_l and os.environ.get(
        "VFMSEG_FLASH_SAFE_SOFTMAX", "0") != "1"
    # dev-only ablation switch (tools/ablate_flash.py): isolates the cost of
    # each kernel phase to attribute the gap to the D=64 matmul roofline.
    # Values: "noexp" (p = s: skip the exp2), "nocast" (AV consumes fp32 p:
    # skip the bf16 cast, MXU at the fp32 rate), "nomm2" (skip the AV
    # matmul), "nomm1" (skip the score matmul). NOT a correctness mode.
    ablate = os.environ.get("VFMSEG_FLASH_ABLATE", "")
    halves = []
    if no_max and os.environ.get("VFMSEG_FLASH_INTERLEAVE", "1") != "0":
        # Interleaved-halves schedule (primal only): the two head halves
        # are independent dependency chains, so emit per kv block
        #   s0, s1 (MXU) -> p0 (VPU) -> AV0 (MXU) || p1 (VPU) -> AV1 (MXU)
        # — one half's exp2 can run under the other half's matmuls. The
        # sequential per-half loop below serializes MXU and VPU phases
        # within each half, which is the measured kernel bottleneck at
        # D=64 (serial model ~65 TF/s; matmul-only roofline ~98).
        # Per-half accumulation order is unchanged (bit-identical results).
        qs = [(qp[:, hh * head_dim:(hh + 1) * head_dim]
               .astype(jnp.float32) * (scale * _LOG2E)).astype(qp.dtype)
              for hh in range(2)]
        accs = [jnp.zeros((block_q, head_dim + 1), dtype=jnp.float32)
                for _ in range(2)]
        for j in range(num_kv):
            masked = has_tail and j == num_kv - 1
            svs = []
            for hh in range(2):
                k = k_ref[0, pl.ds(j * block_k, block_k),
                          hh * head_dim:(hh + 1) * head_dim]
                v = v_ref[0, pl.ds(j * block_k, block_k),
                          hh * head_dim:(hh + 1) * head_dim]
                if masked:
                    kv_row = j * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, k.shape, 0)
                    k = jnp.where(kv_row < kv_len, k, 0)
                    v = jnp.where(kv_row < kv_len, v, 0)
                if ablate == "nomm1":
                    s = jnp.broadcast_to(
                        qs[hh][:, :1].astype(jnp.float32),
                        (block_q, block_k))
                else:
                    s = jax.lax.dot_general(
                        qs[hh], k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if masked:
                    col = j * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, 1)
                    s = jnp.where(col < kv_len, s, _NEG_INF)
                svs.append((s, v))
            for hh in range(2):
                s, v = svs[hh]
                p = s if ablate == "noexp" else jnp.exp2(s)
                if ablate == "nomm2":
                    accs[hh] = accs[hh] + p[:, :head_dim + 1]
                    continue
                v_aug = jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
                if ablate == "nocast":
                    accs[hh] = accs[hh] + jax.lax.dot_general(
                        p, v_aug.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    accs[hh] = accs[hh] + jax.lax.dot_general(
                        p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        for hh in range(2):
            acc = accs[hh]
            safe_l = jnp.maximum(acc[:, head_dim:], 1e-37)
            o_hh = (acc[:, :head_dim] / safe_l).astype(o_ref.dtype)
            if token_major:
                halves.append(o_hh)
            else:
                o_ref[0, 0, hh, :, :] = o_hh
        if token_major:
            o_ref[0, :, :] = jnp.concatenate(halves, axis=1)
        return
    for hh in range(2):
        q = (qp[:, hh * head_dim:(hh + 1) * head_dim].astype(jnp.float32)
             * (scale * _LOG2E)).astype(qp.dtype)

        def step(j, carry, masked):
            m, l, acc = carry
            k = k_ref[0, pl.ds(j * block_k, block_k),
                      hh * head_dim:(hh + 1) * head_dim]
            v = v_ref[0, pl.ds(j * block_k, block_k),
                      hh * head_dim:(hh + 1) * head_dim]
            if masked:
                kv_row = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, k.shape, 0)
                k = jnp.where(kv_row < kv_len, k, 0)
                v = jnp.where(kv_row < kv_len, v, 0)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # log2-space scores
            if masked:
                col = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, _NEG_INF)
            if no_max:
                # serial no-max variant (VFMSEG_FLASH_INTERLEAVE=0 A/B path)
                p = jnp.exp2(s)
                v_aug = jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
                return m, l, acc + jax.lax.dot_general(
                    p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m - m_new)
            if fused_l:
                v_aug = jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
                acc_new = acc * corr + jax.lax.dot_general(
                    p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_new, l, acc_new
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        carry = (jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32),
                 jnp.zeros((block_q, 1), dtype=jnp.float32),
                 jnp.zeros(
                     (block_q, head_dim + 1 if fused_l else head_dim),
                     dtype=jnp.float32))
        for j in range(num_kv - 1 if has_tail else num_kv):
            carry = step(j, carry, masked=False)
        if has_tail:
            carry = step(num_kv - 1, carry, masked=True)
        m, l, acc = carry
        if fused_l:
            safe_l = jnp.maximum(acc[:, head_dim:], 1e-37)
            o_hh = (acc[:, :head_dim] / safe_l).astype(o_ref.dtype)
            if token_major:
                halves.append(o_hh)
            else:
                o_ref[0, 0, hh, :, :] = o_hh
            continue
        safe_l = jnp.maximum(l, 1e-37)
        o_ref[0, 0, hh, :, :] = (acc / safe_l).astype(o_ref.dtype)
        if lse_ref is not None:
            # natural-log lse (what the backward kernels recompute p from)
            lse_ref[0, 0, hh, :, :] = (m + jnp.log2(safe_l)) * (1.0 / _LOG2E)
    if token_major:
        o_ref[0, :, :] = jnp.concatenate(halves, axis=1)


def _fwd_kernel_qkv_tav(*refs, scale: float,
                        kv_len: int, block_k: int, head_dim: int,
                        tail: int = 0, rope: bool = False):
    """Transposed-AV no-max primal: all math runs on s^T = k q^T.

    The natural-orientation AV matmul writes [bq, d+1]: 65 of 128 output
    LANES used, capping it at ~100 TF/s. Transposed, AV becomes
    v_aug^T p^T -> [d+1, bq]: full lanes, 65 -> 72 SUBLANE padding only
    (~90% util, ~177 TF/s cap). No physical transposes anywhere: the
    score matmul is the same contract-on-dim-1 form with q/k swapped,
    AV contracts both operands on dim 0, and the [.., d, n] output
    layout is relayouted by the same XLA pass the [B, N, E] contract
    already pays.

    Two schedule refinements over the first transposed-AV cut (which ran
    54 TF/s at refine shapes vs a ~126 TF/s two-matmul roofline — the
    per-half chain st (MXU) -> exp2+cast (VPU) -> AV (MXU) was serial):
      * interleaved halves — both halves' score matmuls issue before
        either half's exp2/cast/AV, so one half's VPU passes run under
        the other half's matmuls (the two chains are independent;
        per-half accumulation order is unchanged, results bit-identical);
        VFMSEG_FLASH_INTERLEAVE=0 restores the serial schedule for A/B;
      * masked-ones-column tail — pad kv rows zero k (st row = q.0 = 0,
        p = exp2(0) = 1) and zero the whole v_aug row INCLUDING the
        ones column, so their AV contribution is exactly 0.v_aug = 0 for
        every output including the fused denominator. This replaces the
        -inf mask over the full [bk, bq] score tile (the largest VPU
        pass in the kernel) with two [bk, d]-sized wheres and one
        [bk, 1] iota compare. exp2(0)=1 vs exp2(-inf)=0 only ever
        multiplies exact zeros, so outputs are bit-identical.

    Aligned-tail mode (tail=1): the q block carries nq_main + 1 rows but
    the chains compute only the first nq_main (a 128-multiple at ViT
    lengths — zero lane padding in every score/exp2/AV tile); the single
    tail query (the extra cls token) rides a VPU side-chain per (pack,
    half): s = sum_lanes(k * q_tail) per kv row, p = exp2(s),
    tail_acc += sum_rows(v_aug * p) — reusing the k/v granules already in
    VMEM. Padded kv rows contribute exactly 0 (k zeroed -> p = exp2(0) =
    1 times a zeroed v_aug row). A separate tail-writer pallas kernel was
    built first and measured NET SLOWER (136 -> 144 ms per 28-batch
    ViT-L backbone chain): re-reading kv + copying the main output
    through a second kernel costs more HBM than the lane padding costs
    MXU. The earlier XLA-einsum tail hard-crashed the TPU worker when
    fused around the pallas_call (b=26; see _flash_forward_qkv_tav).

    rope=True (EVA02): two extra fp32 refs cos/sin [kv_pad, d] in the
    evens|odds permuted convention (ops/rope.py). q rotates once per cell
    in fp32 during the scale/cast setup; k rotates per granule in the
    operand dtype (the same bf16 numerics as the head-major rope path).
    The pair shuffle is a contiguous d/2 half-swap — no stride-2 vreg
    work. v and the ones column are untouched, and rotation happens
    BEFORE the kv tail masking so zeroed pad rows stay exactly zero."""
    if rope:
        q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    d_half = head_dim // 2

    def _rot(x, cos, sin):
        swapped = jnp.concatenate([x[:, d_half:], x[:, :d_half]], axis=1)
        return x * cos + swapped * sin

    pack = q_ref.shape[0]                  # batch items per grid cell
    block_q = q_ref.shape[1] - tail
    kv_pad = k_ref.shape[1]
    num_kv = kv_pad // block_k
    has_tail = kv_len < kv_pad
    interleave = os.environ.get("VFMSEG_FLASH_INTERLEAVE", "1") != "0"
    # dev-only phase attribution (tools/ablate_flash.py; NOT a correctness
    # mode): "noexp" p = st, "nocast" AV consumes fp32 p, "nomm2" skip AV,
    # "nomm1" score replaced by a broadcast
    ablate = os.environ.get("VFMSEG_FLASH_ABLATE", "")
    # Experimental q chunking (VFMSEG_FLASH_QCHUNK=<width>, default off):
    # splits each half's chain into <width>-lane sub-chains for finer
    # MXU/VPU interleaving. Measured neutral-to-slightly-negative on v5e
    # (refine 56.0 -> 51.2 TF/s at 512, stage-1 68.1 -> 71.2): tiles are
    # 128-lane granular either way, so chunking buys no lane-padding
    # savings, only scheduling granularity the compiler evidently already
    # achieves with two chains. Kept as a knob; per-output-column
    # accumulation order is unchanged (bit-identical) at any width.
    qchunk = int(os.environ.get("VFMSEG_FLASH_QCHUNK", "0"))
    # Canonical-orientation score experiment (VFMSEG_FLASH_QT=1; default
    # OFF): dot_general(k [bk, d], q [sz, d]) contracts the MINOR (lane)
    # dim of BOTH operands, so one might expect a per-cell q transpose to
    # [d, sz] (making the score the canonical lhs-lanes x rhs-sublanes
    # matmul k @ qT) to win. Measured: it LOSES — refine 1.62 -> 2.20 ms
    # (74 -> 55 TF/s) in isolation and 153 -> 3780 ms per bs28 group
    # inside the jitted ViT-L backbone (v5e, RTT-subtracted chains;
    # products are bit-identical either way). Mosaic evidently folds the
    # minor-minor contraction into the MXU feed for free, while the
    # explicit [n, 64] -> [64, n] transpose materializes a relayout that
    # the in-model scheduler serializes badly. Kept as a knob so the A/B
    # stays one env var away.
    q_t = os.environ.get("VFMSEG_FLASH_QT", "0") != "0"
    if qchunk <= 0 or block_q <= qchunk:
        bounds = [(0, block_q)]
    else:
        bounds = [(o, min(qchunk, block_q - o))
                  for o in range(0, block_q, qchunk)]
        if len(bounds) > 1 and bounds[-1][1] < 128:
            # merge a sub-tile remainder into the final chunk: a 128-lane
            # tile is the hardware granularity either way, and Mosaic
            # rejects degenerate 1-lane matmul operands
            (o2, s2), (o1, s1) = bounds.pop(), bounds.pop()
            bounds.append((o1, s1 + s2))
    qs = {}
    nq_rows = q_ref.shape[1]
    if rope:
        cos_q = cos_ref[:nq_rows, :]       # fp32 [nt, d]
        sin_q = sin_ref[:nq_rows, :]
    for bb in range(pack):
        for hh in range(2):
            qf = (q_ref[bb, :, hh * head_dim:(hh + 1) * head_dim]
                  .astype(jnp.float32) * (scale * _LOG2E))
            if rope:
                qf = _rot(qf, cos_q, sin_q)
            qh = qf.astype(q_ref.dtype)
            for (off, sz) in bounds:
                qs[bb, hh, off] = (qh[off:off + sz, :].T if q_t
                                   else qh[off:off + sz, :])
    chains = [(bb, hh, off, sz) for bb in range(pack) for hh in range(2)
              for (off, sz) in bounds]
    accs = {(bb, hh, off): jnp.zeros((head_dim + 1, sz), dtype=jnp.float32)
            for (bb, hh, off, sz) in chains}
    qt, tail_accs = {}, {}
    if tail:
        for bb in range(pack):
            for hh in range(2):
                qtf = (
                    q_ref[bb, block_q:, hh * head_dim:(hh + 1) * head_dim]
                    .astype(jnp.float32) * (scale * _LOG2E))   # [tail, d]
                if rope:
                    qtf = _rot(qtf, cos_q[block_q:, :], sin_q[block_q:, :])
                qt[bb, hh] = qtf
                tail_accs[bb, hh] = jnp.zeros((tail, head_dim + 1),
                                              jnp.float32)

    def tail_step(bb, hh, k, v_aug):
        # VPU side-chain for the tail query (docstring): lane-reduce the
        # score, exp2, sublane-reduce the weighted v_aug (fused denominator
        # via the ones column). Padded kv rows: k zeroed -> p = 1 times a
        # zeroed v_aug row = 0.
        st = jnp.sum(k.astype(jnp.float32) * qt[bb, hh], axis=1,
                     keepdims=True)                            # [bk, 1]
        p = jnp.exp2(st)
        tail_accs[bb, hh] = tail_accs[bb, hh] + jnp.sum(
            v_aug.astype(jnp.float32) * p, axis=0, keepdims=True)

    def load(bb, hh, j, masked):
        k = k_ref[bb, pl.ds(j * block_k, block_k),
                  hh * head_dim:(hh + 1) * head_dim]
        v = v_ref[bb, pl.ds(j * block_k, block_k),
                  hh * head_dim:(hh + 1) * head_dim]
        if rope:
            ck = cos_ref[pl.ds(j * block_k, block_k), :].astype(k.dtype)
            sk = sin_ref[pl.ds(j * block_k, block_k), :].astype(k.dtype)
            k = _rot(k, ck, sk)
        if masked:
            kv_row = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, k.shape, 0)
            keep = kv_row < kv_len
            k = jnp.where(keep, k, 0)
            v = jnp.where(keep, v, 0)
            ones = keep[:, :1].astype(v.dtype)
        else:
            ones = jnp.ones((v.shape[0], 1), v.dtype)
        return k, v, jnp.concatenate([v, ones], axis=-1)

    def score(bb, hh, off, sz, k):
        if ablate == "nomm1":
            return jnp.broadcast_to(
                jnp.zeros((k.shape[0], 1), jnp.float32), (k.shape[0], sz))
        if q_t:
            return jax.lax.dot_general(
                k, qs[bb, hh, off], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [bk, sz]
        return jax.lax.dot_general(
            k, qs[bb, hh, off], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bk, sz]

    def av(bb, hh, off, sz, st, v_aug):
        p = st if ablate == "noexp" else jnp.exp2(st)
        if ablate == "nomm2":
            accs[bb, hh, off] = accs[bb, hh, off] + p[:head_dim + 1, :sz]
            return
        if ablate == "nocast":
            accs[bb, hh, off] = accs[bb, hh, off] + jax.lax.dot_general(
                v_aug.astype(jnp.float32), p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        accs[bb, hh, off] = accs[bb, hh, off] + jax.lax.dot_general(
            v_aug, p.astype(v_aug.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [d+1, sz]

    for j in range(num_kv):
        masked = has_tail and j == num_kv - 1
        if interleave:
            tiles = {(bb, hh): load(bb, hh, j, masked)
                     for bb in range(pack) for hh in range(2)}
            sts = [score(bb, hh, off, sz, tiles[bb, hh][0])
                   for (bb, hh, off, sz) in chains]
            for (bb, hh, off, sz), st in zip(chains, sts):
                av(bb, hh, off, sz, st, tiles[bb, hh][2])
            if tail:
                for bb in range(pack):
                    for hh in range(2):
                        tail_step(bb, hh, tiles[bb, hh][0],
                                  tiles[bb, hh][2])
        else:
            for bb in range(pack):
                for hh in range(2):
                    k, _v, v_aug = load(bb, hh, j, masked)
                    for (off, sz) in bounds:
                        av(bb, hh, off, sz,
                           score(bb, hh, off, sz, k), v_aug)
                    if tail:
                        tail_step(bb, hh, k, v_aug)

    for bb in range(pack):
        for hh in range(2):
            outs = []
            for (off, sz) in bounds:
                acc = accs[bb, hh, off]
                safe_l = jnp.maximum(acc[head_dim:, :], 1e-37)
                outs.append((acc[:head_dim, :] / safe_l).astype(o_ref.dtype))
            if tail:
                ta = tail_accs[bb, hh]                       # [tail, d+1]
                col = (ta[:, :head_dim]
                       / jnp.maximum(ta[:, head_dim:], 1e-37))
                outs.append(jnp.transpose(col).astype(o_ref.dtype))
            o_ref[bb, 0, hh, :, :] = (
                outs[0] if len(outs) == 1
                else jnp.concatenate(outs, axis=1))


def _flash_forward_qkv_tav(qkv, num_heads: int, scale: float, rope_cs=None):
    """qkv [B, N, 3HD] -> out [B, H/2, 2, D, N] (transposed layout).

    One q block per cell (grid = batch x head-pairs): the [.., D, N]
    output block must tile (8, 128) or span the array, and N is not a
    128-multiple at ViT lengths — spanning it sidesteps the constraint,
    and the whole-sequence score tile (<=8.5 MB fp32 at stage-1 lengths)
    sits comfortably in VMEM.

    Aligned-tail split: the q length is the LANE dim of every score tile,
    exp2 pass, and AV output, so n = 1025 pads to 1152 lanes — 12.4% of
    the kernel's MXU and VPU work computing garbage columns (6.2% at the
    stage-1 length 2049). The kernel therefore computes only the first
    n - (n % 128) queries (exactly aligned); the <=127 tail queries
    (1 at ViT lengths: the extra cls token) attend via two trivial XLA
    einsums over the same kv and concatenate onto the minor dim. kv keeps
    all n rows in both parts — outputs are the same attention, the tail
    rows merely use XLA's exact softmax instead of the kernel's exp2
    formulation (both within bf16 matmul noise of each other).

    Measured (v5e, bf16): refine shape 28x1025 59.3 -> 67.3 TF/s, but
    stage-1 8x2049 72.2 -> 66.7 — the tail glue (two einsums + concat +
    the [.., D, n_main] output no longer matching downstream layouts)
    costs a fixed ~0.15 ms, worth paying only when the lane padding it
    removes is large.

    VFMSEG_FLASH_ALIGN_TAIL modes:
      * "auto" (default): in-kernel tail side-chain when the tail is a
        single token and the lane padding it removes is >= 10% of the
        sequence (refine 1025 -> 12.4% yes; stage-1 2049 -> 6.2% no,
        where the saving measured below run-to-run noise).
      * "1": force the in-kernel tail side-chain.
      * "xla": the original XLA-einsum tail (kept as the crash record:
        embedded in the full ViT-L refine graph it hard-crashed the TPU
        worker at specific batch sizes — b=26 reproducibly, while
        22/24/28 passed and the standalone kernel passed everywhere, so
        the fault lives in how XLA fuses the tail einsums/concat around
        the pallas_call; optimization_barrier fencing did NOT clear it).
        The in-kernel side-chain (_fwd_kernel_qkv_tav tail=1) removes
        that fusion surface entirely — no XLA op touches the kernel's
        operands — and tools/repro_align_tail.py passes at every refine
        bucket size with it (incl. the old crasher b=26).
      * "0": no split (12.4% lane padding at refine length)."""
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    h2 = num_heads // 2
    tail = n % 128
    mode = os.environ.get("VFMSEG_FLASH_ALIGN_TAIL", "auto")
    if rope_cs is not None and mode == "xla":
        # the XLA-einsum tail predates in-kernel rope and would need its own
        # rotation plumbing; the in-kernel side-chain covers the tail
        mode = "auto"
    if tail == 1 and n > 128 and (
            mode == "1"
            or (mode == "auto" and (128 - tail) / n >= 0.10)):
        return _flash_forward_qkv_tav_main(qkv, num_heads, scale, n - tail,
                                           tail=tail, rope_cs=rope_cs)
    if tail and n > 128 and mode == "xla":
        n_main = n - tail
        out_main = _flash_forward_qkv_tav_main(qkv, num_heads, scale, n_main)
        # optimization_barrier fences the tail einsums from the pallas_call:
        # without it XLA fuses the qkv slices/einsums/concat into the same
        # computation as the kernel's operand pipeline, which faulted the
        # TPU worker at specific batch sizes (b=26; see docstring). The
        # barrier forces the tail to read a materialized qkv copy of its
        # slices and the concat to consume finished buffers — the fixed
        # cost is ~the 0.15 ms tail glue already accounted for.
        qkv_t = jax.lax.optimization_barrier(qkv)
        hd = num_heads * d
        q_t = (qkv_t[:, n_main:, :hd].astype(jnp.float32)
               * scale).astype(qkv.dtype).reshape(b, tail, num_heads, d)
        k_all = qkv_t[:, :, hd:2 * hd].reshape(b, n, num_heads, d)
        v_all = qkv_t[:, :, 2 * hd:].reshape(b, n, num_heads, d)
        s = jnp.einsum("bthd,bnhd->bhtn", q_t, k_all,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o_tail = jnp.einsum("bhtn,bnhd->bhtd", p.astype(v_all.dtype), v_all,
                            preferred_element_type=jnp.float32)
        o_tail = (o_tail.astype(out_main.dtype)
                  .reshape(b, h2, 2, tail, d).transpose(0, 1, 2, 4, 3))
        out_main, o_tail = jax.lax.optimization_barrier((out_main, o_tail))
        return jnp.concatenate([out_main, o_tail], axis=-1)
    return _flash_forward_qkv_tav_main(qkv, num_heads, scale, n,
                                       rope_cs=rope_cs)


def _flash_forward_qkv_tav_main(qkv, num_heads: int, scale: float,
                                nq: int, tail: int = 0, rope_cs=None):
    """The TAV pallas_call; chains cover queries [0:nq], a `tail` of extra
    queries (rows nq:nq+tail) rides the in-kernel VPU side-chain. kv spans
    all n rows either way. rope_cs: optional fp32 (cos, sin) [n, d] tables
    in the evens|odds permuted convention (ops/rope.py) — in-kernel EVA02
    rotation of q/k."""
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    h2 = num_heads // 2
    explicit = any(k in os.environ for k in (
        "VFMSEG_FLASH_BLOCK", "VFMSEG_FLASH_BLOCK_Q", "VFMSEG_FLASH_BLOCK_K"))
    if not explicit and n >= 1000:
        # TAV-specific policy: at ViT eval lengths a 3-way kv split beats
        # both the single whole-sequence block and the 2x1032 policy under
        # the interleaved-halves schedule (v5e sweep: refine n=1025
        # 54.0 -> 56.0 TF/s with bk=344, stage-1 n=2049 69.6 -> 72.0 with
        # bk=688) — smaller granules overlap the two halves' phases better.
        block_k = _round_up(-(-_round_up(n, 8) // 3), 8)
    else:
        _, block_k = _blocks(n, n)
    kvp = _round_up(n, block_k)
    # Batch packing (VFMSEG_FLASH_PACK, default 4): a grid cell covers
    # `pack` batch items, amortizing per-cell fixed costs (q scale/cast
    # setup, grid sequencing, sub-roofline ramp of each chain's matmuls)
    # over pack x the work. v5e sweep at the refine shape (28x1025):
    # pack 2 -> 48.0 TF/s, pack 4 -> 59.7, pack 7 -> 54.9. The budget
    # check models every per-pack VMEM resident under the interleaved
    # schedule — double-buffered q/k/v/out pipeline blocks, 2 in-flight
    # fp32 score tiles of [block_k, n] + their bf16 exp2 casts, the
    # scaled q copies, fp32 accumulators, and the k/v/v_aug granules —
    # with a 1.3x Mosaic-overhead fudge calibrated against a measured
    # stage-1 OOM (n=2049 pack=4 wanted 111.6 MB; the model x1.3 says
    # 121 MB; without the fudge it under-predicted at 93 MB). Fallback
    # steps to the largest divisor of b that fits instead of collapsing
    # to 1 (refine buckets are even, so odd tails still pack pairs).
    itemsize = qkv.dtype.itemsize
    per_pack = (
        2 * (nq * 2 * d + 2 * kvp * 2 * d + 2 * d * nq) * itemsize  # pipeline
        + 2 * block_k * nq * (4 + itemsize)  # score tiles fp32 + p casts
        + 2 * nq * d * itemsize              # scaled q
        + 2 * (d + 1) * nq * 4               # accumulators
        + 2 * block_k * (3 * d + 1) * itemsize)  # k/v/v_aug granules
    budget = int(0.94 * _VMEM_LIMIT.vmem_limit_bytes / 1.3)
    pack = int(os.environ.get("VFMSEG_FLASH_PACK", "4"))
    while pack > 1 and (b % pack or pack * per_pack > budget):
        pack -= 1
    grid = (b // pack, h2)
    nt = nq + tail
    in_specs = [
        pl.BlockSpec((pack, nt, 2 * d), lambda bi, hi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pack, kvp, 2 * d),
                     lambda bi, hi: (bi, 0, h2 + hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pack, kvp, 2 * d),
                     lambda bi, hi: (bi, 0, 2 * h2 + hi),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qkv, qkv, qkv]
    if rope_cs is not None:
        cosP, sinP = rope_cs
        # rows pad to kvp with identity (cos=1, sin=0); the kv tail mask
        # zeroes those rows after rotation anyway
        pad = kvp - cosP.shape[0]
        cosP = jnp.pad(cosP.astype(jnp.float32), ((0, pad), (0, 0)),
                       constant_values=1.0)
        sinP = jnp.pad(sinP.astype(jnp.float32), ((0, pad), (0, 0)))
        table_spec = pl.BlockSpec((kvp, d), lambda bi, hi: (0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs += [table_spec, table_spec]
        operands += [cosP, sinP]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_qkv_tav, scale=scale, kv_len=n,
                          block_k=block_k, head_dim=d, tail=tail,
                          rope=rope_cs is not None),
        compiler_params=_VMEM_LIMIT,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((pack, 1, 2, d, nt),
                               lambda bi, hi: (bi, hi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, 2, d, nt), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * nt * n * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * nt * n,
        ),
    )(*operands)


def _flash_forward_qkv(qkv, num_heads: int, scale: float,
                       with_lse: bool = True, token_major: bool = False):
    """qkv [B, N, 3*H*D] -> (out [B, H, N, D], lse [B, H, N, 1] or None).

    token_major (primal only): out is [B, N, H*D] — each grid cell's head
    pair is one 128-lane tile of the feature axis, so the store is a single
    aligned write and downstream matmuls consume it with no relayout."""
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    h2 = num_heads // 2
    block_q, block_k = _blocks(n, n)
    kvp = _round_up(n, block_k)
    grid = (b, h2, pl.cdiv(n, block_q))
    if token_major:
        if with_lse:
            raise NotImplementedError("token_major is primal-only (no lse)")
        o_spec = pl.BlockSpec((1, block_q, 2 * d),
                              lambda bi, hi, qi: (bi, qi, hi),
                              memory_space=pltpu.VMEM)
        o_shape = jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype)
    else:
        o_spec = pl.BlockSpec((1, 1, 2, block_q, d),
                              lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                              memory_space=pltpu.VMEM)
        o_shape = jax.ShapeDtypeStruct((b, h2, 2, n, d), qkv.dtype)
    if with_lse:
        out_specs = (o_spec,
                     pl.BlockSpec((1, 1, 2, block_q, 1),
                                  lambda bi, hi, qi: (bi, hi, 0, qi, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (o_shape,
                     jax.ShapeDtypeStruct((b, h2, 2, n, 1), jnp.float32))
    else:
        out_specs = o_spec
        out_shape = o_shape
    res = pl.pallas_call(
        functools.partial(_fwd_kernel_qkv, scale=scale, kv_len=n,
                          block_k=block_k, head_dim=d, with_lse=with_lse,
                          token_major=token_major),
        compiler_params=_VMEM_LIMIT,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * d), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvp, 2 * d),
                         lambda bi, hi, qi: (bi, 0, h2 + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvp, 2 * d),
                         lambda bi, hi, qi: (bi, 0, 2 * h2 + hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(qkv, qkv, qkv)
    out, lse = res if with_lse else (res, None)
    if token_major:
        return out, None
    return (out.reshape(b, num_heads, n, d),
            lse.reshape(b, num_heads, n, 1) if with_lse else None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash_qkv(qkv, num_heads: int, scale: float):
    # primal (never differentiated at this call site): skip the lse store
    out, _ = _flash_forward_qkv(qkv, num_heads, scale, with_lse=False)
    return out


def _flash_qkv_fwd_rule(qkv, num_heads: int, scale: float):
    out, lse = _flash_forward_qkv(qkv, num_heads, scale)
    return out, (qkv, lse, out)


def _flash_qkv_bwd_rule(num_heads: int, scale: float, res, g):
    # training path: transpose views + the head-major backward kernels, then
    # reassemble d(qkv). The extra layout passes only cost the bwd.
    qkv, lse, out = res
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    qkv_r = qkv.reshape(b, n, 3, num_heads, d)
    q = qkv_r[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv_r[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv_r[:, :, 2].transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_backward_hm(q, k, v, lse, out, g, scale,
                                    exp2_scale_q=True)
    dqkv = jnp.stack([dq, dk, dv], axis=1)            # [B, 3, H, N, D]
    dqkv = dqkv.transpose(0, 3, 1, 2, 4).reshape(b, n, f)
    return (dqkv,)


_flash_qkv.defvjp(_flash_qkv_fwd_rule, _flash_qkv_bwd_rule)


# --------------------------------------------------------------------------
# qkv-direct backward (token-major residuals end to end)
#
# The hm backward route pays 5 HBM relayout passes around its kernels:
# q/k/v sliced+transposed out of qkv, g transposed head-major, and the
# dq/dk/dv stack+transpose reassembly into d(qkv) — ~3.3 ms per 48x1025
# batch on v5e (tools/profile_train.py), pure layout work. These kernels
# read q/k/v as lane-offset views of the SAME qkv array (exactly like the
# fused forward), consume g and out in the token-major layout the proj
# backward hands over, and write dq/dk/dv as token-major [B, N, HD] thirds
# that concatenate (one contiguous minor-axis copy) into d(qkv).
# --------------------------------------------------------------------------


def _bwd_dq_kernel_qkv(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, *, scale: float, kv_len: int, block_k: int,
                       head_dim: int):
    d = head_dim
    kv_pad = k_ref.shape[1]
    num_kv = kv_pad // block_k
    has_tail = kv_len < kv_pad
    for hh in range(2):
        q = q_ref[0, :, hh * d:(hh + 1) * d]
        do = do_ref[0, :, hh * d:(hh + 1) * d]
        lse = lse_ref[0, 0, hh, :, :]            # [bq, 1] fp32
        delta = delta_ref[0, 0, hh, :, :]
        block_q = q.shape[0]
        qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

        def step(j, dq, masked):
            k = k_ref[0, pl.ds(j * block_k, block_k), hh * d:(hh + 1) * d]
            v = v_ref[0, pl.ds(j * block_k, block_k), hh * d:(hh + 1) * d]
            if masked:
                kv_row = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, k.shape, 0)
                k = jnp.where(kv_row < kv_len, k, 0)
                v = jnp.where(kv_row < kv_len, v, 0)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if masked:
                col = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, _NEG_INF)
            p = jnp.exp2(s - lse * _LOG2E)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = ((p * (dp - delta)) * scale).astype(k.dtype)
            return dq + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dq = jnp.zeros((block_q, d), jnp.float32)
        for j in range(num_kv - 1 if has_tail else num_kv):
            dq = step(j, dq, masked=False)
        if has_tail:
            dq = step(num_kv - 1, dq, masked=True)
        dq_ref[0, :, hh * d:(hh + 1) * d] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel_qkv(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dk_ref, dv_ref, *, scale: float, q_len: int,
                        block_q: int, head_dim: int):
    d = head_dim
    q_pad = q_ref.shape[1]
    num_q = q_pad // block_q
    has_q_tail = q_len < q_pad
    for hh in range(2):
        k = k_ref[0, :, hh * d:(hh + 1) * d]
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        block_k = k.shape[0]

        def body(i, carry):
            dk, dv = carry
            q = q_ref[0, pl.ds(i * block_q, block_q), hh * d:(hh + 1) * d]
            do = do_ref[0, pl.ds(i * block_q, block_q), hh * d:(hh + 1) * d]
            lse = lse_ref[0, 0, hh, pl.ds(i * block_q, block_q), :]
            delta = delta_ref[0, 0, hh, pl.ds(i * block_q, block_q), :]
            if has_q_tail:
                qd_row = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, q.shape, 0)
                q = jnp.where(qd_row < q_len, q, 0)
                do = jnp.where(qd_row < q_len, do, 0)
            qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp2(s - lse * _LOG2E)
            if has_q_tail:
                row = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, p.shape, 0)
                p = jnp.where(row < q_len, p, 0.0)
            dv_new = dv + jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds_raw = p * (dp - delta)
            if has_q_tail:
                ds_raw = jnp.where(row < q_len, ds_raw, 0.0)
            ds = (ds_raw * scale).astype(q.dtype)
            dk_new = dk + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_new, dv_new

        carry = (jnp.zeros((block_k, d), jnp.float32),
                 jnp.zeros((block_k, d), jnp.float32))
        for i in range(num_q):
            carry = body(i, carry)
        dk, dv = carry
        dk_ref[0, :, hh * d:(hh + 1) * d] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, hh * d:(hh + 1) * d] = dv.astype(dv_ref.dtype)


def _flash_backward_qkv_tm(qkv, g_tm, out_tm, lse, scale: float,
                           num_heads: int):
    """qkv [B,N,3HD] + token-major g/out + lse [B,H,N,1] -> d(qkv).

    Probabilities recompute from the exp2-folded pre-scaled q exactly as
    the fused forward computed them (exp2_scale_q semantics)."""
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    h2 = num_heads // 2
    block_q, block_k = _blocks(n, n)
    kvp = _round_up(n, block_k)
    qp = _round_up(n, block_q)

    # per-(token, head) delta = rowsum(dO * O), computed token-major then
    # relayouted as a [B, H, N, 1] fp32 array (262 KB at train shapes —
    # noise next to the 25 MB operand transposes this path removes)
    delta = jnp.sum(
        (g_tm.astype(jnp.float32) * out_tm.astype(jnp.float32))
        .reshape(b, n, num_heads, d), axis=-1).transpose(0, 2, 1)[..., None]
    lse5 = lse.reshape(b, h2, 2, n, 1)
    delta5 = delta.reshape(b, h2, 2, n, 1)

    qkv_spec_q = pl.BlockSpec((1, block_q, 2 * d),
                              lambda bi, hi, i: (bi, i, hi),
                              memory_space=pltpu.VMEM)
    qkv_spec_kv_full = [
        pl.BlockSpec((1, kvp, 2 * d), lambda bi, hi, i: (bi, 0, h2 + hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvp, 2 * d), lambda bi, hi, i: (bi, 0, 2 * h2 + hi),
                     memory_space=pltpu.VMEM),
    ]
    rowvec_q = pl.BlockSpec((1, 1, 2, block_q, 1),
                            lambda bi, hi, i: (bi, hi, 0, i, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_qkv, scale=scale, kv_len=n,
                          block_k=block_k, head_dim=d),
        compiler_params=_VMEM_LIMIT,
        grid=(b, h2, pl.cdiv(n, block_q)),
        in_specs=[qkv_spec_q] + qkv_spec_kv_full + [
            qkv_spec_q,                               # do (token-major)
            rowvec_q, rowvec_q],                      # lse, delta
        out_specs=pl.BlockSpec((1, block_q, 2 * d),
                               lambda bi, hi, i: (bi, i, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype),
    )(qkv, qkv, qkv, g_tm,
      lse5.reshape(b, h2, 2, n, 1), delta5)

    q_full = pl.BlockSpec((1, qp, 2 * d), lambda bi, hi, i: (bi, 0, hi),
                          memory_space=pltpu.VMEM)
    kv_spec_k = pl.BlockSpec((1, block_k, 2 * d),
                             lambda bi, hi, i: (bi, i, h2 + hi),
                             memory_space=pltpu.VMEM)
    kv_spec_v = pl.BlockSpec((1, block_k, 2 * d),
                             lambda bi, hi, i: (bi, i, 2 * h2 + hi),
                             memory_space=pltpu.VMEM)
    rowvec_full = pl.BlockSpec((1, 1, 2, qp, 1),
                               lambda bi, hi, i: (bi, hi, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_qkv, scale=scale, q_len=n,
                          block_q=block_q, head_dim=d),
        compiler_params=_VMEM_LIMIT,
        grid=(b, h2, pl.cdiv(n, block_k)),
        in_specs=[q_full, kv_spec_k, kv_spec_v, q_full,
                  rowvec_full, rowvec_full],
        out_specs=(
            pl.BlockSpec((1, block_k, 2 * d), lambda bi, hi, i: (bi, i, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 2 * d), lambda bi, hi, i: (bi, i, hi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype),
                   jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype)),
    )(qkv, qkv, qkv, g_tm, lse5, delta5)
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash_qkv_tm(qkv, num_heads: int, scale: float):
    # primal: the [B, N, E] output contract. With the interleaved-halves
    # kernel the head-major store (big contiguous per-half DMAs) plus one
    # XLA relayout pass measured FASTER than the direct token-major store
    # (128-lane strips into a 1024-wide row are 256 B strided bursts):
    # refine shape 1.73 ms vs 2.23 ms on v5e. VFMSEG_TM_STORE=1 restores
    # the direct-store kernel for ablation.
    if os.environ.get("VFMSEG_TM_STORE", "0") == "1":
        out, _ = _flash_forward_qkv(qkv, num_heads, scale, with_lse=False,
                                    token_major=True)
        return out
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    if os.environ.get("VFMSEG_FLASH_TAV", "1") != "0":
        out_t = _flash_forward_qkv_tav(qkv, num_heads, scale)
        # [B, H/2, 2, D, N]: feature index (pair, half, d) == head-major
        return out_t.transpose(0, 4, 1, 2, 3).reshape(b, n, num_heads * d)
    out_hm, _ = _flash_forward_qkv(qkv, num_heads, scale, with_lse=False)
    return out_hm.transpose(0, 2, 1, 3).reshape(b, n, num_heads * d)


def _flash_qkv_tm_fwd_rule(qkv, num_heads: int, scale: float):
    # training fwd keeps the head-major kernel (exact online softmax +
    # lse); one transpose pass to the [B, N, E] output contract, and the
    # TOKEN-major out doubles as the residual for the qkv-direct backward
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    out_hm, lse = _flash_forward_qkv(qkv, num_heads, scale)
    out = out_hm.transpose(0, 2, 1, 3).reshape(b, n, num_heads * d)
    if os.environ.get("VFMSEG_FLASH_QKV_BWD", "direct") == "hm":
        return out, (qkv, lse, out_hm, None)
    return out, (qkv, lse, None, out)


def _flash_qkv_tm_bwd_rule(num_heads: int, scale: float, res, g):
    qkv, lse, out_hm, out_tm = res
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    if out_tm is not None:
        # qkv-direct: no operand/grad transposes (see _flash_backward_qkv_tm)
        return (_flash_backward_qkv_tm(qkv, g, out_tm, lse, scale,
                                       num_heads),)
    g_hm = g.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    qkv_r = qkv.reshape(b, n, 3, num_heads, d)
    q = qkv_r[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv_r[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv_r[:, :, 2].transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_backward_hm(q, k, v, lse, out_hm, g_hm, scale,
                                    exp2_scale_q=True)
    dqkv = jnp.stack([dq, dk, dv], axis=1)            # [B, 3, H, N, D]
    dqkv = dqkv.transpose(0, 3, 1, 2, 4).reshape(b, n, f)
    return (dqkv,)


_flash_qkv_tm.defvjp(_flash_qkv_tm_fwd_rule, _flash_qkv_tm_bwd_rule)


def flash_attention_qkv_tm(qkv: jax.Array, num_heads: int, *,
                           scale: Optional[float] = None,
                           rope_cs=None) -> jax.Array:
    """Like :func:`flash_attention_qkv` but returns token-major [B, N, H*D].

    The inference primal stores each head pair as one 128-lane tile of the
    feature axis, so attention output feeds the proj matmul with no
    transpose/reshape relayout (measured ~1 ms/block at refine shapes).

    rope_cs: optional (cos, sin) [N, d] fp32 tables in the evens|odds
    permuted convention (ops/rope.py) — q/k rotate INSIDE the kernel
    (EVA02 on the fast fused primal; requires the caller to permute the
    q/k projection columns to match). Primal-only: differentiating this
    path raises (training uses the head-major rope path)."""
    if qkv.ndim != 3:
        raise NotImplementedError("expects [B, N, 3*H*D]")
    if num_heads % 2:
        raise NotImplementedError("pair-of-heads cells need even num_heads")
    d = qkv.shape[-1] // (3 * num_heads)
    if scale is None:
        scale = d ** -0.5
    if rope_cs is not None:
        b, n, f = qkv.shape
        out_t = _flash_forward_qkv_tav(qkv, num_heads, float(scale),
                                       rope_cs=rope_cs)
        return out_t.transpose(0, 4, 1, 2, 3).reshape(b, n, num_heads * d)
    return _flash_qkv_tm(qkv, num_heads, float(scale))


def flash_attention_qkv(qkv: jax.Array, num_heads: int, *,
                        scale: Optional[float] = None) -> jax.Array:
    """Flash attention straight off the fused qkv projection output.

    qkv: [B, N, 3*H*D] (q | k | v concatenated on the feature axis, each
    head-contiguous — exactly the fused qkv Dense layout). Returns
    [B, H, N, D]. Requires an even head count (cells process head pairs).
    """
    if qkv.ndim != 3:
        raise NotImplementedError("expects [B, N, 3*H*D]")
    if num_heads % 2:
        raise NotImplementedError("pair-of-heads cells need even num_heads")
    d = qkv.shape[-1] // (3 * num_heads)
    if scale is None:
        scale = d ** -0.5
    return _flash_qkv(qkv, num_heads, float(scale))


def _fwd_kernel_hm_tav(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       kv_len: int, block_k: int):
    # transposed-AV no-max primal over separate [B, H, N, D] operands —
    # same formulation as _fwd_kernel_qkv_tav (see its docstring). One head
    # per cell, so the interleaved dependency chains come from a
    # lane-aligned SPLIT OF Q (two column halves of the transposed score
    # tile) instead of the fused kernel's head pair: q-half A's exp2/cast
    # runs under q-half B's matmuls. Each output column's accumulation
    # order is unchanged — bit-identical to the serial schedule
    # (VFMSEG_FLASH_INTERLEAVE=0). Tail kv rows use the masked-ones-column
    # trick (zeroed k rows score 0, exp2(0)=1 multiplies an all-zero
    # v_aug row) so the -inf pass over the score tile disappears.
    q = (q_ref[0, 0, :, :].astype(jnp.float32)
         * (scale * _LOG2E)).astype(q_ref.dtype)
    n, d = q.shape
    kv_pad = k_ref.shape[2]
    num_kv = kv_pad // block_k
    has_tail = kv_len < kv_pad
    # lane-aligned split point (score lanes = q rows); no split under 256
    na = (n // 2) // 128 * 128
    interleave = (os.environ.get("VFMSEG_FLASH_INTERLEAVE", "1") != "0"
                  and na >= 128)
    # canonical-orientation experiment (see _fwd_kernel_qkv_tav: measured
    # SLOWER in isolation and in-model; default off, knob kept for A/B)
    q_t = os.environ.get("VFMSEG_FLASH_QT", "0") != "0"
    qs = [q[:na, :], q[na:, :]] if interleave else [q]
    if q_t:
        qs = [qq.T for qq in qs]                         # [d, nq_i]
    accs = [jnp.zeros((d + 1, qq.shape[-1] if q_t else qq.shape[0]),
                      dtype=jnp.float32)
            for qq in qs]
    for j in range(num_kv):
        masked = has_tail and j == num_kv - 1
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        if masked:
            kv_row = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, k.shape, 0)
            keep = kv_row < kv_len
            k = jnp.where(keep, k, 0)
            v = jnp.where(keep, v, 0)
            ones = keep[:, :1].astype(v.dtype)
        else:
            ones = jnp.ones((v.shape[0], 1), v.dtype)
        v_aug = jnp.concatenate([v, ones], axis=-1)
        sts = [jax.lax.dot_general(
            k, qq, (((1,), (0 if q_t else 1,)), ((), ())),
            preferred_element_type=jnp.float32) for qq in qs]  # [bk, nq_i]
        for i, st in enumerate(sts):
            p = jnp.exp2(st)
            accs[i] = accs[i] + jax.lax.dot_general(
                v_aug, p.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [d+1, nq_i]
    col = 0
    for acc in accs:
        safe_l = jnp.maximum(acc[d:, :], 1e-37)
        o_ref[0, 0, :, col:col + acc.shape[1]] = (
            acc[:d, :] / safe_l).astype(o_ref.dtype)
        col += acc.shape[1]


def _flash_forward_hm_tav(q, k, v, scale: float):
    """[B, H, N, D] -> [B, H, D, N] transposed-AV primal (no lse)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    _, block_k = _blocks(nq, nk)
    kvp = _round_up(nk, block_k)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_hm_tav, scale=scale, kv_len=nk,
                          block_k=block_k),
        compiler_params=_VMEM_LIMIT,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, nq, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, d, nq), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d, nq), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_hm(q, k, v, scale: float):
    # primal (never differentiated at this call site): skip the lse store.
    # Transposed-AV by default; consumers transpose to token-major right
    # after, so XLA composes the two transposes into the one relayout the
    # head-major output already paid.
    if os.environ.get("VFMSEG_FLASH_TAV", "1") != "0":
        return _flash_forward_hm_tav(q, k, v, scale).transpose(0, 1, 3, 2)
    out, _ = _flash_forward_hm(q, k, v, scale, with_lse=False)
    return out


def _flash_hm_fwd_rule(q, k, v, scale: float):
    out, lse = _flash_forward_hm(q, k, v, scale)
    return out, (q, k, v, lse, out)


def _flash_hm_bwd_rule(scale: float, res, g):
    q, k, v, lse, out = res
    return _flash_backward_hm(q, k, v, lse, out, g, scale)


_flash_hm.defvjp(_flash_hm_fwd_rule, _flash_hm_bwd_rule)


def flash_attention_headmajor(
    q: jax.Array, k: jax.Array, v: jax.Array, *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Flash attention over head-major [B, H, N, D] tensors (no bias).

    Unlike :func:`flash_attention` this performs ZERO HBM-side layout work:
    no transpose, no padding. Producers that already emit head-major
    operands (the ViT's per-slot qkv einsums) should call this.
    """
    if q.ndim != 4:
        raise NotImplementedError("expects [B, H, N, D]")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_hm(q, k, v, float(scale))


# --------------------------------------------------------------------------
# head-major flash with k-SEPARABLE rel-pos bias built in-kernel (SAM,
# sam_vit.py add_decomposed_rel_pos): bias[q, kh*w + kw] =
# rel_h[q, kh] + rel_w[q, kw]. The [B, H, N, N] bias/logits tensors never
# exist anywhere — the per-kv-block bias tile is reconstructed on the fly
# from the separable terms via two constant one-hot matmuls (the one-hots
# are iota comparisons; MXU cost 2*bq*bk*(h+w), trivial VMEM).
# --------------------------------------------------------------------------

def _fwd_kernel_relpos(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                       scale: float, kv_len: int, block_k: int, w: int):
    # primal-only kernel: no-max exp2 softmax (see _fwd_kernel_qkv — the
    # row-max pass and rescale carry are the VPU bottleneck; fp32 exp2 has
    # >2^40 headroom over trained attention-logit magnitudes). The rel-pos
    # terms are folded into log2 space alongside the score scale.
    no_max = os.environ.get("VFMSEG_FLASH_SAFE_SOFTMAX", "0") != "1"
    q = q_ref[0, 0, :, :]
    lg = _LOG2E if no_max else 1.0
    rh = rh_ref[0, 0, :, :] * lg         # [bq, h] (tiny VPU tile)
    rw = rw_ref[0, 0, :, :] * lg         # [bq, w]
    h = rh.shape[1]
    block_q, d = q.shape
    kv_pad = k_ref.shape[2]
    num_kv = kv_pad // block_k
    has_tail = kv_len < kv_pad

    def step(j, carry, masked):
        m, acc = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        if masked:
            kv_row = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, k.shape, 0)
            k = jnp.where(kv_row < kv_len, k, 0)
            v = jnp.where(kv_row < kv_len, v, 0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * lg)
        # separable bias tile: one-hot selectors for this block's columns
        col = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (h, block_k), 1)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (h, block_k), 0)
        mh = (row_h == col // w).astype(q.dtype)
        col_w = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (w, block_k), 1)
        row_w = jax.lax.broadcasted_iota(jnp.int32, (w, block_k), 0)
        mw = (row_w == col_w % w).astype(q.dtype)
        s = s + jax.lax.dot_general(
            rh, mh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            rw, mw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            cmask = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1)
            s = jnp.where(cmask < kv_len, s, _NEG_INF)
        v_aug = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
        if no_max:
            p = jnp.exp2(s)
            acc_new = acc + jax.lax.dot_general(
                p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m, acc_new
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        # l rides the AV matmul (see _fwd_kernel fused_l)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, acc_new

    carry = (jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32),
             jnp.zeros((block_q, d + 1), dtype=jnp.float32))
    for j in range(num_kv - 1 if has_tail else num_kv):
        carry = step(j, carry, masked=False)
    if has_tail:
        carry = step(num_kv - 1, carry, masked=True)
    m, acc = carry
    safe_l = jnp.maximum(acc[:, d:], 1e-37)
    o_ref[0, 0, :, :] = (acc[:, :d] / safe_l).astype(o_ref.dtype)


def _flash_forward_relpos_hm(q, k, v, rel_h, rel_w, w: int, scale: float):
    """[B, H, N, D] + separable terms -> out [B, H, N, D] (primal only)."""
    b, heads, nq, d = q.shape
    nk = k.shape[2]
    block_q, block_k = _blocks(nq, nk)
    kvp = _round_up(nk, block_k)
    grid = (b, heads, pl.cdiv(nq, block_q))
    h = rel_h.shape[-1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_relpos, scale=scale, kv_len=nk,
                          block_k=block_k, w=w),
        compiler_params=_VMEM_LIMIT,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kvp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, h), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, w), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * nq * nk * d
            + 4 * b * heads * nq * nk * (h + w) // 2,
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * heads * nq * nk,
        ),
    )(q, k, v, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_relpos_hm(q, k, v, rel_h, rel_w, w: int, scale: float):
    return _flash_forward_relpos_hm(q, k, v, rel_h, rel_w, w, scale)


def _flash_relpos_fwd_rule(q, k, v, rel_h, rel_w, w: int, scale: float):
    out = _flash_forward_relpos_hm(q, k, v, rel_h, rel_w, w, scale)
    return out, (q, k, v, rel_h, rel_w)


def _flash_relpos_bwd_rule(w: int, scale: float, res, g):
    # training path: recompute through the XLA decomposed formulation (the
    # [N, N] materialization only costs the backward, as before this kernel)
    from vfmseg_tpu.ops.attention import xla_attention_decomposed_hm

    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, rh_, rw_: xla_attention_decomposed_hm(
            q_, k_, v_, rh_, rw_, scale=scale), q, k, v, rel_h, rel_w)
    return vjp(g)


_flash_relpos_hm.defvjp(_flash_relpos_fwd_rule, _flash_relpos_bwd_rule)


def flash_attention_relpos_hm(q, k, v, rel_h, rel_w, *,
                              scale: Optional[float] = None):
    """Flash attention over head-major [B, H, N, D] with SAM's decomposed
    rel-pos bias applied in-kernel from its k-separable terms
    (rel_h [B, H, N, kh], rel_w [B, H, N, kw]; N = kh*kw)."""
    if q.ndim != 4:
        raise NotImplementedError("expects [B, H, N, D]")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    w = rel_w.shape[-1]
    if rel_h.shape[-1] * w != q.shape[2]:
        raise NotImplementedError("N must equal kh*kw")
    return _flash_relpos_hm(q, k, v, rel_h, rel_w, w, float(scale))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale: float):
    out, _, _ = _flash_forward(q, k, v, scale, with_lse=False)
    return out


def _flash_fwd_rule(q, k, v, scale: float):
    out, lse, (qp, kp, vp, _) = _flash_forward(q, k, v, scale)
    nq_pad = qp.shape[2]
    out_pad = jnp.pad(out.transpose(0, 2, 1, 3),
                      ((0, 0), (0, 0), (0, nq_pad - out.shape[1]), (0, 0)))
    return out, (qp, kp, vp, lse, out_pad, q.shape[1], k.shape[1])


def _flash_bwd_rule(scale: float, res, g):
    qp, kp, vp, lse, out_pad, nq, nk = res
    return _flash_backward(qp, kp, vp, lse, out_pad, g, scale, nq, nk)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_bias(q, k, v, bias, scale: float):
    out, _, _ = _flash_forward(q, k, v, scale, bias, with_lse=False)
    return out


def _flash_bias_fwd_rule(q, k, v, bias, scale: float):
    out, lse, (qp, kp, vp, biasp) = _flash_forward(q, k, v, scale, bias)
    nq_pad = qp.shape[2]
    out_pad = jnp.pad(out.transpose(0, 2, 1, 3),
                      ((0, 0), (0, 0), (0, nq_pad - out.shape[1]), (0, 0)))
    return out, (qp, kp, vp, biasp, lse, out_pad, q.shape[1], k.shape[1])


def _flash_bias_bwd_rule(scale: float, res, g):
    qp, kp, vp, biasp, lse, out_pad, nq, nk = res
    dq, dk, dv, dbias = _flash_backward(qp, kp, vp, lse, out_pad, g, scale,
                                        nq, nk, biasp)
    return dq, dk, dv, dbias.astype(biasp.dtype)


_flash_bias.defvjp(_flash_bias_fwd_rule, _flash_bias_bwd_rule)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *,
    scale: Optional[float] = None, bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash attention over [B, N, H, D] tensors. `bias` (optional) is an
    additive attention bias broadcastable to [B, H, Nq, Nk] (e.g. SAM's
    decomposed rel-pos, sam_vit.py add_decomposed_rel_pos)."""
    if q.ndim != 4:
        raise NotImplementedError("flash_attention expects [B, N, H, D]")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if bias is None:
        return _flash(q, k, v, float(scale))
    b, nq, h, _ = q.shape
    nk = k.shape[1]
    bias = jnp.broadcast_to(bias, (b, h, nq, nk))
    return _flash_bias(q, k, v, bias, float(scale))
