"""MixVisionTransformer (SegFormer MiT-B0..B5) backbone.

The reference's DAFormer model bases use mmseg's `mit_b5`
(/root/reference/configs/_base_/models/daformer_conv1_mitb5.py:16); mmseg is
an external dependency there, so this is a TPU-native rebuild of the SegFormer
encoder (Xie et al., 2021):

  * 4 stages of overlapping patch embeds (k7s4, then k3s2) + transformer
    blocks; per-stage LayerNorm; NHWC feature maps out.
  * Efficient self-attention: keys/values spatially reduced by a strided
    conv of ratio sr (8/4/2/1 per stage) before plain MHA — at 512² inputs
    the stage-1 kv sequence drops 64x, keeping the QK^T matmul MXU-sized.
  * Mix-FFN: Dense -> 3x3 depthwise conv (positional mixing) -> GELU ->
    Dense; no explicit positional embedding, so any input resolution works
    under jit with static shapes.

Everything is batched dense compute (convs + matmuls) — no dynamic shapes,
no host control flow; attention rides the shared multi_head_attention
dispatcher (Pallas flash kernel on TPU where applicable).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.ops.attention import multi_head_attention
from vfmseg_tpu.ops.norm import LayerNorm


class EfficientAttention(nn.Module):
    """SegFormer spatial-reduction attention over an NHWC feature map."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, head_dim)

        kv_src = x
        if self.sr_ratio > 1:
            kv_src = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                             strides=(self.sr_ratio, self.sr_ratio),
                             dtype=self.dtype, name="sr")(x)
            kv_src = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name="sr_norm")(kv_src)
        kh, kw = kv_src.shape[1:3]
        kv = nn.Dense(self.dim * 2, dtype=self.dtype, name="kv")(kv_src)
        kv = kv.reshape(b, kh * kw, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]

        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """Dense -> depthwise 3x3 (positional mixing) -> GELU -> Dense."""

    dim: int
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.Conv(self.hidden_dim, (3, 3), padding="SAME",
                    feature_group_count=self.hidden_dim, dtype=self.dtype,
                    name="dwconv")(x)
        x = nn.gelu(x, approximate=False)   # torch nn.GELU (exact erf)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    drop_path: float = 0.0
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        def maybe_drop(residual):
            if self.drop_path <= 0.0 or deterministic:
                return residual
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (residual.shape[0], 1, 1, 1))
            return residual * mask.astype(residual.dtype) / keep

        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                               attn_impl=self.attn_impl, dtype=self.dtype,
                               name="attn")(y, deterministic)
        x = x + maybe_drop(y)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MixFFN(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype,
                   name="mlp")(y, deterministic)
        return x + maybe_drop(y)


class MixVisionTransformer(nn.Module):
    """4-stage hierarchical encoder; returns one NHWC map per stage
    ([H/4, H/8, H/16, H/32])."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 6, 40, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        feats = []
        total = sum(self.depths)
        block_idx = 0
        for stage in range(4):
            if stage == 0:
                x = nn.Conv(self.embed_dims[0], (7, 7), strides=(4, 4),
                            padding=[(3, 3), (3, 3)], dtype=self.dtype,
                            name="patch_embed1")(x)
            else:
                x = nn.Conv(self.embed_dims[stage], (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name=f"patch_embed{stage + 1}")(x)
            x = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"embed_norm{stage + 1}")(x)
            for i in range(self.depths[stage]):
                dp = self.drop_path_rate * block_idx / max(total - 1, 1)
                x = MiTBlock(self.embed_dims[stage], self.num_heads[stage],
                             self.mlp_ratio, self.sr_ratios[stage],
                             drop_path=dp, attn_impl=self.attn_impl,
                             dtype=self.dtype,
                             name=f"stage{stage + 1}_block{i}")(
                                 x, deterministic)
            x = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm{stage + 1}")(x)
            feats.append(x)
        return tuple(feats)


# MiT variant table (SegFormer paper, Table 1)
_MIT_VARIANTS = {
    "b0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "b1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "b2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "b3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "b4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "b5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3)),
}


@MODELS.register("MixVisionTransformer")
def build_mit(variant: Optional[str] = None,
              embed_dims: Sequence[int] = (64, 128, 320, 512),
              depths: Sequence[int] = (3, 6, 40, 3),
              num_heads: Sequence[int] = (1, 2, 5, 8),
              sr_ratios: Sequence[int] = (8, 4, 2, 1),
              mlp_ratio: float = 4.0,
              drop_path_rate: float = 0.1,
              style: str = "pytorch",      # accepted for config parity
              init_cfg=None,
              dtype: Any = jnp.float32,
              attn_impl: str = "auto",
              **_unused) -> MixVisionTransformer:
    del style, init_cfg
    if variant is not None:
        v = _MIT_VARIANTS[variant]
        embed_dims, depths = v["embed_dims"], v["depths"]
    return MixVisionTransformer(
        embed_dims=tuple(embed_dims), depths=tuple(depths),
        num_heads=tuple(num_heads), sr_ratios=tuple(sr_ratios),
        mlp_ratio=mlp_ratio, drop_path_rate=drop_path_rate,
        attn_impl=attn_impl, dtype=dtype)


def _register_variants():
    for name in _MIT_VARIANTS:
        def make(variant):
            def builder(**kwargs):
                kwargs.pop("variant", None)
                return build_mit(variant=variant, **kwargs)
            return builder
        MODELS.register(f"mit_{name}")(make(name))


_register_variants()
