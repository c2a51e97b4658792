"""Stable-diffusion-style cross-attention decoder blocks.

Rebuilds rein/models/heads/Transformer.py: BasicTransformerBlock = pre-LN
self-attention -> cross-attention over a context stream -> GEGLU feed-forward
(Transformer.py:158-177); TransformerDecoder GroupNorms the spatial query,
flattens to tokens and runs `depth` blocks (:228-252); MaskTransformerDecoder
additionally replaces a random `mask_ratio` of query pixels with a learned
mask token during training (:255-283), disabled during inference stage-2
(Ms_VFM_encoder_decoder.py:422-423).

Attention rides ops.multi_head_attention (Pallas flash kernel on TPU) —
the TPU-native replacement for the reference's xformers path
(Transformer.py:138-156).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.common import gn_groups
from vfmseg_tpu.ops.attention import multi_head_attention
from vfmseg_tpu.ops.norm import LayerNorm


class CrossAttention(nn.Module):
    """q from x, k/v from context (self-attention if context is None)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, context.shape[1], self.heads, self.dim_head)
        v = v.reshape(b, context.shape[1], self.heads, self.dim_head)
        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, n, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=not train)
        return out


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        xg = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="geglu")(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(x)


class BasicTransformerBlock(nn.Module):
    query_dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dropout: float = 0.0
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.query_dim, None, self.n_heads, self.d_head, self.dropout,
            self.attn_impl, self.dtype, name="attn1",
        )(h, None, train)
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.query_dim, self.context_dim, self.n_heads, self.d_head,
            self.dropout, self.attn_impl, self.dtype, name="attn2",
        )(h, context, train)
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.query_dim, 4, self.dropout, self.dtype,
                            name="ff")(h, train)
        return x


@MODELS.register("TransformerDecoder")
class TransformerDecoder(nn.Module):
    """Decode a spatial query stream against a spatial context stream.

    The MsVFM pipeline calls this with query = fused image features and
    context = embedded coarse seg-logits (VFMHead.py:82). mask_ratio > 0 makes
    this the reference's MaskTransformerDecoder: during training (and only
    when `mask_enable`), random query pixels are swapped for a learned mask
    token before decoding (Transformer.py:263-273).
    """

    query_dim: int
    img_feat_dim: int
    n_heads: int = 8
    d_head: int = 64
    depth: int = 1
    dropout: float = 0.0
    mask_ratio: float = 0.0
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, context: jax.Array,
                 train: bool = False, mask_enable: bool = True) -> jax.Array:
        b, qh, qw, c = query.shape
        ch, cw = context.shape[1], context.shape[2]
        if self.mask_ratio > 0 and mask_enable:
            mask_token = self.param(
                "mask_token", nn.initializers.normal(1.0), (1, 1, 1, c))
            keep = (
                jax.random.uniform(self.make_rng("mask"), (b, qh, qw, 1))
                > self.mask_ratio
            )
            query = jnp.where(keep, query, mask_token.astype(query.dtype))
        x = nn.GroupNorm(num_groups=gn_groups(c), epsilon=1e-6, dtype=self.dtype,
                         name="norm")(query)
        x = x.reshape(b, qh * qw, c)
        context = context.reshape(b, ch * cw, context.shape[-1])
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.query_dim, self.n_heads, self.d_head, self.img_feat_dim,
                self.dropout, self.attn_impl, self.dtype, name=f"block_{i}",
            )(x, context, train)
        # reference reshapes with the *context* spatial dims
        # (Transformer.py:251); query/context are co-spatial in this pipeline
        return x.reshape(b, ch, cw, c)


@MODELS.register("MaskTransformerDecoder")
def build_mask_transformer_decoder(mask_ratio: float = 0.2, **kwargs):
    return TransformerDecoder(mask_ratio=mask_ratio, **kwargs)
