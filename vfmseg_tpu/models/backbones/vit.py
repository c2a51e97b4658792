"""Unified Vision Transformer core.

One configurable ViT replaces the reference's four vendored backbone files
(rein/models/backbones/{dino_v2,eva_02,clip,sam_vit}.py — SURVEY §7.1 "One
ViT core"): DINOv2 / EVA02 / CLIP / SAM are parameterizations (position
embedding kind, FFN kind, RoPE, windowing, pre/post-LN) constructed by the
factories in dinov2.py / eva02.py / clip.py / sam.py.

TPU-first choices:
  * NHWC layouts, static shapes; pos-embed interpolation is resolved at trace
    time per static input size (mirrors dino_v2.py:184-215 numerics, incl.
    the +0.1 scale-factor trick, via ops/resize torch-parity bicubic).
  * attention runs through ops.multi_head_attention (Pallas flash kernel on
    TPU, fused XLA elsewhere).
  * adapters (LoRA / Rein) are param-tree overlays, not module surgery.
  * per-block remat is available for memory-bound training.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.models.backbones.adapters import (
    LoRASpec,
    Reins,
    ReinsSpec,
    make_dense,
)
from vfmseg_tpu.ops.attention import multi_head_attention
from vfmseg_tpu.ops.resize import resize


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    img_size: int = 512
    out_indices: Tuple[int, ...] = (7, 11, 15, 23)
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    ffn_layer: str = "mlp"  # "mlp" | "swiglu"
    init_values: Optional[float] = 1e-5  # LayerScale; None disables
    drop_path_rate: float = 0.0
    ln_eps: float = 1e-6
    num_cls_tokens: int = 1  # 0 => no cls token (SAM)
    pos_embed: str = "learned"  # "learned" (cls+grid, bicubic interp) | "none"
    final_norm: bool = False  # DINOv2 collects pre-norm features
    # SAM-style windowed attention: window size and the block indices that
    # attend globally (sam_vit.py:111-125). None disables windowing.
    window_size: Optional[int] = None
    global_attn_indexes: Tuple[int, ...] = ()
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Any = jnp.float32


class Mlp(nn.Module):
    hidden: int
    out: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, use_bias=self.use_bias, dtype=self.dtype,
                     name="fc2")(x)
        return x


class SwiGLU(nn.Module):
    """DINOv2 SwiGLUFFNFused-style gated FFN (dino_layers/swiglu_ffn.py)."""

    hidden: int
    out: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x12 = nn.Dense(2 * self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                       name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.out, use_bias=self.use_bias, dtype=self.dtype,
                        name="w3")(nn.silu(x1) * x2)


class Attention(nn.Module):
    """MHA with fused qkv (DINOv2 layout) and optional LoRA on qkv/proj."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    lora: Optional[LoRASpec] = None
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = make_dense("qkv", 3 * self.dim, self.qkv_bias, self.lora, self.dtype)(
            x, deterministic=deterministic
        )
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, n, c)
        return make_dense("proj", self.dim, self.proj_bias, self.lora, self.dtype)(
            out, deterministic=deterministic
        )


class LayerScale(nn.Module):
    dim: int
    init_values: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_values),
                           (self.dim,))
        return x * gamma.astype(self.dtype)


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng) -> jax.Array:
    """Stochastic depth on the residual branch (dino_layers/drop_path.py)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-LN transformer block with LayerScale (dino_layers/block.py:43-110)."""

    cfg: ViTConfig
    drop_path_rate: float = 0.0
    lora: Optional[LoRASpec] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg

        def _residual(branch):
            if deterministic or self.drop_path_rate == 0.0:
                return branch
            rng = self.make_rng("dropout")
            return drop_path(branch, self.drop_path_rate, deterministic, rng)

        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm1")(x)
        h = Attention(
            dim=cfg.embed_dim, num_heads=cfg.num_heads, qkv_bias=cfg.qkv_bias,
            proj_bias=cfg.proj_bias, lora=self.lora, attn_impl=cfg.attn_impl,
            dtype=cfg.dtype, name="attn",
        )(h, deterministic=deterministic)
        if cfg.init_values is not None:
            h = LayerScale(cfg.embed_dim, cfg.init_values, cfg.dtype, name="ls1")(h)
        x = x + _residual(h)

        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm2")(x)
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        if cfg.ffn_layer == "mlp":
            h = Mlp(hidden, cfg.embed_dim, cfg.ffn_bias, cfg.dtype, name="mlp")(h)
        elif cfg.ffn_layer == "swiglu":
            swiglu_hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            h = SwiGLU(swiglu_hidden, cfg.embed_dim, cfg.ffn_bias, cfg.dtype,
                       name="mlp")(h)
        else:
            raise ValueError(f"unknown ffn_layer {cfg.ffn_layer!r}")
        if cfg.init_values is not None:
            h = LayerScale(cfg.embed_dim, cfg.init_values, cfg.dtype, name="ls2")(h)
        return x + _residual(h)


class VisionTransformer(nn.Module):
    """ViT backbone emitting 4 spatial feature maps [B, H/p, W/p, C].

    Mirrors the reference contract (SURVEY §2.3: every backbone emits a tuple
    of 4 maps from intermediate blocks) plus an optional Rein query vector
    when a ReinsSpec is configured (reins_dinov2.py:22-34).
    """

    cfg: ViTConfig
    lora: Optional[LoRASpec] = None
    reins: Optional[ReinsSpec] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        b, h, w, _ = x.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=cfg.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        if cfg.num_cls_tokens:
            cls = self.param(
                "cls_token", nn.initializers.truncated_normal(0.02),
                (1, cfg.num_cls_tokens, cfg.embed_dim),
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype),
                                  (b, cfg.num_cls_tokens, cfg.embed_dim)), x],
                axis=1,
            )

        if cfg.pos_embed == "learned":
            x = x + self._interpolated_pos_embed(gh, gw).astype(x.dtype)

        rein_mod = None
        if self.reins is not None:
            rein_mod = Reins(
                spec=self.reins, num_layers=cfg.depth, embed_dims=cfg.embed_dim,
                patch_size=cfg.patch_size, dtype=cfg.dtype, name="reins",
            )

        dpr = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1) for i in range(cfg.depth)
        ]
        block_cls = Block
        if cfg.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
        out_norm = (
            nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm")
            if cfg.final_norm else None
        )
        outs = []
        for i in range(cfg.depth):
            x = block_cls(
                cfg=cfg, drop_path_rate=dpr[i], lora=self.lora, name=f"blocks_{i}"
            )(x, deterministic)
            if rein_mod is not None and (
                self.reins.apply_indices is None or i in self.reins.apply_indices
            ):
                x = rein_mod.adapt(x, i, num_prefix_tokens=cfg.num_cls_tokens)
            if i in cfg.out_indices:
                feat = out_norm(x) if out_norm is not None else x
                feat = feat[:, cfg.num_cls_tokens:, :].reshape(
                    b, gh, gw, cfg.embed_dim)
                outs.append(feat)

        feats = tuple(outs)
        if rein_mod is not None and self.reins.link_token_to_query:
            return feats, rein_mod.queries()
        return feats

    def _interpolated_pos_embed(self, gh: int, gw: int) -> jax.Array:
        """Reference-faithful pos-embed interpolation (dino_v2.py:184-215):
        bicubic (torch a=-0.75) with the +0.1 scale-factor trick, applied to
        the grid part; cls part passes through. Static per (gh, gw)."""
        cfg = self.cfg
        n_grid = (cfg.img_size // cfg.patch_size) ** 2
        n_prefix = cfg.num_cls_tokens
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, n_grid + n_prefix, cfg.embed_dim),
        )
        side = int(math.sqrt(n_grid))
        if gh == gw and gh * gw == n_grid:
            return pos
        prefix, grid = pos[:, :n_prefix], pos[:, n_prefix:]
        grid = grid.reshape(1, side, side, cfg.embed_dim)
        # torch: scale_factor=((gh+0.1)/side, (gw+0.1)/side), bicubic
        from vfmseg_tpu.ops.resize import _apply_separable  # internal, static

        grid = _apply_separable(
            grid.astype(jnp.float32), (gh, gw), "bicubic", False,
            ((gh + 0.1) / side, (gw + 0.1) / side),
        )
        grid = grid.reshape(1, gh * gw, cfg.embed_dim)
        if n_prefix:
            return jnp.concatenate([prefix, grid.astype(pos.dtype)], axis=1)
        return grid.astype(pos.dtype)
