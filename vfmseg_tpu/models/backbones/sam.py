"""SAM ViT-H image encoder backbone factory.

Parameterizes the unified ViT core as SAM's ViTDet-style encoder (reference
rein/models/backbones/sam_vit.py + configs/_base_/models/lora_sam_ms_masked.py):
no cls token, grid absolute pos-embed, window attention (window 14) with
global attention at global_attn_indexes [7,15,23,31], decomposed relative
position bias (global tables sized for the 1024/16=64 pretrain grid and
linearly resized at runtime, sam_vit.py:260-275,360-390), LN eps 1e-6,
embed 1280 / depth 32 / heads 16, out_indices = global_attn_indexes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.backbones.adapters import LoRASpec, ReinsSpec
from vfmseg_tpu.models.backbones.vit import ViTConfig, VisionTransformer


@MODELS.register("SAMViT")
def build_sam(
    img_size: int = 512,
    patch_size: int = 16,
    embed_dim: int = 1280,
    depth: int = 32,
    num_heads: int = 16,
    mlp_ratio: float = 4.0,
    qkv_bias: bool = True,
    out_indices: Sequence[int] = (7, 15, 23, 31),
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31),
    window_size: int = 14,
    use_rel_pos: bool = True,
    use_abs_pos: bool = True,
    pretrain_img_size: int = 1024,
    lora: Optional[LoRASpec] = None,
    reins: Optional[ReinsSpec] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    resize_feat: bool = False,
    **_unused,
) -> VisionTransformer:
    cfg = ViTConfig(
        patch_size=patch_size,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=mlp_ratio,
        img_size=img_size,
        out_indices=tuple(out_indices),
        qkv_bias=qkv_bias,
        proj_bias=True,
        ffn_layer="mlp",
        init_values=None,
        ln_eps=1e-6,
        num_cls_tokens=0,
        pos_embed="learned_2d" if use_abs_pos else "none",
        window_size=window_size or None,
        global_attn_indexes=tuple(global_attn_indexes),
        use_rel_pos=use_rel_pos,
        rel_pos_pretrain_extent=pretrain_img_size // patch_size,
        attn_impl=attn_impl,
        remat=remat,
        resize_feat=resize_feat,
        dtype=dtype,
    )
    return VisionTransformer(cfg=cfg, lora=lora, reins=reins)


def sam_vit_h(img_size: int = 512, lora: Optional[LoRASpec] = None,
              reins: Optional[ReinsSpec] = None, dtype: Any = jnp.float32,
              attn_impl: str = "auto", remat: bool = False) -> VisionTransformer:
    return build_sam(img_size=img_size, lora=lora, reins=reins, dtype=dtype,
                     attn_impl=attn_impl, remat=remat)


def sam_tiny_for_tests(img_size: int = 64, depth: int = 4, embed_dim: int = 32,
                       num_heads: int = 2, window_size: int = 2,
                       global_attn_indexes: Sequence[int] = (1, 3),
                       out_indices: Sequence[int] = (0, 1, 2, 3),
                       lora: Optional[LoRASpec] = None,
                       dtype: Any = jnp.float32) -> VisionTransformer:
    return build_sam(
        img_size=img_size, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, window_size=window_size,
        global_attn_indexes=global_attn_indexes, out_indices=out_indices,
        pretrain_img_size=128, lora=lora, dtype=dtype, attn_impl="xla")
