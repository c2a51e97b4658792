"""Multi-head attention ops.

The reference's hot attention paths are xformers ``memory_efficient_attention``
CUDA kernels (rein/models/backbones/dino_layers/attention.py:72-90,
rein/models/heads/Transformer.py:138-156) with a naive matmul-softmax fallback
(attention.py:56-69). Here:

  * :func:`xla_attention` — the numerics-defining implementation (softmax in
    fp32, matmuls with fp32 accumulation); XLA fuses this well on TPU and it
    is fully differentiable.
  * :func:`multi_head_attention` — dispatcher; on TPU it routes the forward
    pass to the Pallas flash-attention kernel (ops/flash_attention.py) via a
    custom VJP whose backward recomputes with XLA (cheap at ViT sequence
    lengths, keeps training correct while the fwd kernel rides VMEM).

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
        from vfmseg_tpu.ops.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, scale=scale, bias=bias)
        except NotImplementedError:
            pass
    return xla_attention(q, k, v, scale=scale, bias=bias)
