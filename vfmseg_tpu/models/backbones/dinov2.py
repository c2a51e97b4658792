"""DINOv2 ViT backbone factories.

Parameterizes the unified ViT core as DINOv2-L (reference
rein/models/backbones/dino_v2.py: patch 16 after conversion, embed 1024,
depth 24, heads 16, LayerScale init 1e-5, out_indices [7,11,15,23], LN eps
1e-6, exact GELU, learned pos-embed with bicubic interpolation).

Builders accept the reference config surface so config files translate 1:1
(configs/_base_/models/lora_dinov2_ms_masked.py:15-37).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.backbones.adapters import LoRASpec, ReinsSpec
from vfmseg_tpu.models.backbones.vit import ViTConfig, VisionTransformer


@MODELS.register("DinoVisionTransformer")
def build_dinov2(
    patch_size: int = 16,
    embed_dim: int = 1024,
    depth: int = 24,
    num_heads: int = 16,
    mlp_ratio: float = 4.0,
    img_size: int = 512,
    ffn_layer: str = "mlp",
    init_values: Optional[float] = 1e-5,
    qkv_bias: bool = True,
    proj_bias: bool = True,
    ffn_bias: bool = True,
    out_indices: Sequence[int] = (7, 11, 15, 23),
    drop_path_rate: float = 0.0,
    block_chunks: int = 0,  # accepted for config parity; chunking is a torch
    # FSDP artifact with no TPU analogue (SURVEY §2.10)
    lora: Optional[LoRASpec] = None,
    reins: Optional[ReinsSpec] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    resize_feat: bool = False,
    **_unused,
) -> VisionTransformer:
    del block_chunks
    cfg = ViTConfig(
        patch_size=patch_size,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=mlp_ratio,
        img_size=img_size,
        out_indices=tuple(out_indices),
        qkv_bias=qkv_bias,
        proj_bias=proj_bias,
        ffn_bias=ffn_bias,
        ffn_layer=ffn_layer,
        init_values=init_values,
        drop_path_rate=drop_path_rate,
        ln_eps=1e-6,
        num_cls_tokens=1,
        pos_embed="learned",
        final_norm=False,
        attn_impl=attn_impl,
        remat=remat,
        resize_feat=resize_feat,
        dtype=dtype,
    )
    return VisionTransformer(cfg=cfg, lora=lora, reins=reins)


@MODELS.register("LoRABackbone")
def build_lora_backbone(backbone: dict, Lora_config: dict, checkpoint: str = "",
                        **extra) -> VisionTransformer:
    """Reference LoRABackbone (lora_backbone.py:12-24): wrap an inner backbone
    with LoRA on target linears. Checkpoint loading is handled by the weight
    tooling (tools/convert_*), not at build time. Reference per-backbone
    target names (out_proj / mlp.c_fc / attn.proj / ...) are normalized to
    the unified ViT's module names."""
    from vfmseg_tpu.models.backbones.clip import normalize_lora_targets

    lora = LoRASpec(
        rank=Lora_config.get("r", 0),
        alpha=Lora_config.get("lora_alpha", 1.0),
        dropout=Lora_config.get("lora_dropout", 0.0),
        targets=normalize_lora_targets(Lora_config.get("target_modules", ())),
    )
    cfg = dict(backbone)
    cfg.update(extra)
    return MODELS.build(cfg, lora=lora)


def dinov2_large(img_size: int = 512, lora: Optional[LoRASpec] = None,
                 reins: Optional[ReinsSpec] = None, dtype: Any = jnp.float32,
                 attn_impl: str = "auto", remat: bool = False) -> VisionTransformer:
    return build_dinov2(img_size=img_size, lora=lora, reins=reins, dtype=dtype,
                        attn_impl=attn_impl, remat=remat)


def dinov2_tiny_for_tests(img_size: int = 64, depth: int = 4,
                          embed_dim: int = 32, num_heads: int = 2,
                          out_indices: Sequence[int] = (0, 1, 2, 3),
                          lora: Optional[LoRASpec] = None,
                          reins: Optional[ReinsSpec] = None,
                          dtype: Any = jnp.float32) -> VisionTransformer:
    """A miniature DINOv2-shaped ViT for fast CPU tests."""
    return build_dinov2(
        patch_size=16, embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        img_size=img_size, out_indices=out_indices, lora=lora, reins=reins,
        dtype=dtype, attn_impl="xla",
    )
