"""Multi-head attention ops.

The reference's hot attention paths are xformers ``memory_efficient_attention``
CUDA kernels (rein/models/backbones/dino_layers/attention.py:72-90,
rein/models/heads/Transformer.py:138-156) with a naive matmul-softmax fallback
(attention.py:56-69). Here:

  * :func:`xla_attention` — the numerics-defining implementation (softmax in
    fp32, matmuls with fp32 accumulation); XLA fuses this well on TPU and it
    is fully differentiable.
  * :func:`multi_head_attention` — dispatcher; on TPU it routes to the
    Pallas flash-attention kernels (ops/flash_attention.py): an LSE-free
    inference primal, and for training a custom VJP whose forward rule
    keeps full residuals and whose backward runs the two-kernel Pallas
    flash backward (dQ and dKV kernels, flash_attention.py:1298-1766).

Layout convention everywhere: ``[batch, seq, heads, head_dim]`` (the xformers
layout, which is also the natural TPU layout: head_dim=64/128 on the lane
dimension).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain attention: softmax(q k^T * scale) v, computed per head.

    q: [B, Nq, H, D], k/v: [B, Nk, H, D], bias (optional): broadcastable to
    [B, H, Nq, Nk]. Returns [B, Nq, H, D] in q.dtype. Softmax runs in fp32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _default_impl() -> str:
    backend = jax.default_backend()
    return "pallas" if backend == "tpu" else "xla"


@functools.lru_cache(maxsize=8)
def _warn_odd_heads_downgrade(num_heads: int) -> None:
    import warnings

    warnings.warn(
        f"impl='pallas' requested but num_heads={num_heads} is odd; the "
        "fused-qkv flash kernel processes head PAIRS per grid cell, so "
        "this call falls back to the XLA attention path",
        stacklevel=3)


def xla_attention_headmajor(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain attention over head-major [B, H, N, D] tensors (fp32 softmax)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def xla_attention_decomposed_hm(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_h: jax.Array,
    rel_w: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention with a k-separable decomposed rel-pos bias (SAM,
    sam_vit.py add_decomposed_rel_pos) added straight onto the logits.

    q/k/v: [B, H, N, D] with N = kh*kw; rel_h: [B, H, N, kh];
    rel_w: [B, H, N, kw]. The logits view [..., N, kh, kw] is a free
    minor-dim split, so the two broadcast adds fuse into the score
    matmul's output — the [B, H, N, N] bias tensor of the generic path
    (805 MB fp32 per SAM-H global block at 12x512^2) never exists."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n, _d = q.shape
    kh = rel_h.shape[-1]
    kw = rel_w.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    logits = (logits.reshape(b, h, n, kh, kw)
              + rel_h.astype(jnp.float32)[..., :, None]
              + rel_w.astype(jnp.float32)[..., None, :])
    probs = jax.nn.softmax(logits.reshape(b, h, n, kh * kw), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def multi_head_attention_decomposed_hm(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_h: jax.Array,
    rel_w: jax.Array,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Attention with SAM's k-separable decomposed rel-pos bias.

    On TPU this rides the flash kernel that rebuilds the bias tile
    in-kernel from the separable terms — neither the [B, H, N, N] logits
    nor the bias ever reach HBM (the XLA path materializes the logits)."""
    if impl == "auto":
        impl = _default_impl()
    if impl in ("pallas", "pallas_bias"):
        from vfmseg_tpu.ops.flash_attention import flash_attention_relpos_hm

        return flash_attention_relpos_hm(q, k, v, rel_h, rel_w, scale=scale)
    return xla_attention_decomposed_hm(q, k, v, rel_h, rel_w, scale=scale)


def multi_head_attention_qkv(
    qkv: jax.Array,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """MHA straight off a fused qkv projection output [B, N, 3*H*D].

    Returns [B, H, N, D]. On TPU the Pallas kernel reads q/k/v as
    lane-offset views of the SAME tensor — the single fastest path for the
    ViT hot loop (one natural-layout [E, 3HD] matmul, zero layout ops).
    """
    requested = impl
    if impl == "auto":
        impl = _default_impl()
    if impl in ("pallas", "pallas_bias"):
        if num_heads % 2 == 0:
            from vfmseg_tpu.ops.flash_attention import flash_attention_qkv

            return flash_attention_qkv(qkv, num_heads, scale=scale)
        if requested != "auto":
            # an explicitly requested pallas impl silently hitting the XLA
            # path is a surprising perf cliff — say so once
            _warn_odd_heads_downgrade(num_heads)
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    qkv_r = qkv.reshape(b, n, 3, num_heads, d)
    out = xla_attention(qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2],
                        scale=scale)
    return out.transpose(0, 2, 1, 3)


def multi_head_attention_qkv_tm(
    qkv: jax.Array,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
    rope_cs=None,
) -> jax.Array:
    """MHA off a fused qkv projection, returning token-major [B, N, H*D].

    The ViT hot loop's preferred form: the Pallas primal stores attention
    output in the proj matmul's natural layout, eliminating the per-block
    transpose+reshape relayout the [B, H, N, D] contract forces.

    rope_cs: optional (cos, sin) [N, d] tables in the evens|odds PERMUTED
    convention (ops/rope.py) — q/k rotate inside the Pallas kernel (or in
    the XLA fallback below, which defines the numerics). The caller must
    have permuted the q/k projection columns to the matching layout."""
    requested = impl
    if impl == "auto":
        impl = _default_impl()
    if impl in ("pallas", "pallas_bias"):
        if num_heads % 2 == 0:
            from vfmseg_tpu.ops.flash_attention import flash_attention_qkv_tm

            return flash_attention_qkv_tm(qkv, num_heads, scale=scale,
                                          rope_cs=rope_cs)
        if requested != "auto":
            _warn_odd_heads_downgrade(num_heads)
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    qkv_r = qkv.reshape(b, n, 3, num_heads, d)
    q, k, v = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]
    if rope_cs is not None:
        from vfmseg_tpu.ops.rope import apply_rope_permuted

        cos = rope_cs[0].astype(q.dtype)[None, :, None, :]
        sin = rope_cs[1].astype(q.dtype)[None, :, None, :]
        q = apply_rope_permuted(q, cos, sin)
        k = apply_rope_permuted(k, cos, sin)
    out = xla_attention(q, k, v, scale=scale)
    return out.reshape(b, n, num_heads * d)


def multi_head_attention_headmajor(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """MHA over head-major [B, H, N, D] operands.

    The hot path for producers that emit q/k/v head-major (the ViT's
    per-slot einsums): on TPU the Pallas no-pad kernel consumes them with
    zero HBM-side layout work (flash_attention.py flash_attention_headmajor).
    """
    if impl == "auto":
        impl = _default_impl()
    if impl in ("pallas", "pallas_bias") and bias is None:
        from vfmseg_tpu.ops.flash_attention import flash_attention_headmajor

        return flash_attention_headmajor(q, k, v, scale=scale)
    if impl == "pallas_bias" and bias is not None:
        # memory opt-in: the flash bias/dbias kernels never materialize the
        # [B, H, Nq, Nk] probability tensors; the [B, N, H, D] transposes
        # are the price of entry
        from vfmseg_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), scale=scale, bias=bias)
        return out.transpose(0, 2, 1, 3)
    return xla_attention_headmajor(q, k, v, scale=scale, bias=bias)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching MHA. impl: 'auto' | 'xla' | 'pallas'."""
    if impl == "auto":
        impl = _default_impl()
    # biasless attention: the flash kernel wins ~2.3x (no [N, N] tensors).
    # With a bias, XLA's fused path measured FASTER on the forward (the bias
    # already lives in HBM), so it stays the default; impl="pallas_bias"
    # opts into the flash kernel, whose win is MEMORY — it never
    # materializes the [B, H, Nq, Nk] probability tensors XLA's backward
    # does, only bias/dbias.
    if impl in ("pallas", "pallas_bias") and (bias is None
                                              or impl == "pallas_bias"):
        if (bias is None and q.shape == k.shape == v.shape
                and q.shape[2] % 2 == 0 and (2 * q.shape[3]) % 128 == 0):
            # Same-shape q/k/v (decoder self/cross attention at matched
            # lengths): one concat re-creates the fused-qkv Dense layout
            # and rides the TAV head-pair inference primal — the old
            # per-(batch,head)-cell kernel measured ~4x slower at the
            # VFMHead shape 28x1024x8x64 (it has no batch packing, no
            # interleaved-halves schedule, and a natural-orientation AV
            # that uses 65 of 128 output lanes).
            from vfmseg_tpu.ops.flash_attention import flash_attention_qkv_tm

            b, n, h, d = q.shape
            qkv = jnp.concatenate(
                [t.reshape(b, n, h * d) for t in (q, k, v)], axis=-1)
            out = flash_attention_qkv_tm(qkv, h, scale=scale)
            return out.reshape(b, n, h, d)
        from vfmseg_tpu.ops.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, scale=scale, bias=bias)
        except NotImplementedError:
            pass
    return xla_attention(q, k, v, scale=scale, bias=bias)
