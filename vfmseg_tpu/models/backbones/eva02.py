"""EVA02 ViT-L backbone factory.

Parameterizes the unified ViT core as EVA02-L (reference
rein/models/backbones/eva_02.py + configs/_base_/models/lora_eva02_ms_masked.py):
patch 16 (converted), embed 1024, depth 24, heads 16, mlp_ratio 8/3 with the
EVA SwiGLU (sub-LN), split q/k/v projections (k bias-free), 2D rotary
embedding on patch tokens (pt_hw_seq_len 16, interpolated frequencies),
learned absolute pos-embed, out_indices [7,11,15,23], LN eps 1e-6, no
LayerScale (init_values=None in the config), drop_path 0.1 when training.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.backbones.adapters import LoRASpec, ReinsSpec
from vfmseg_tpu.models.backbones.vit import ViTConfig, VisionTransformer


@MODELS.register("EVA2")
def build_eva02(
    patch_size: int = 16,
    embed_dim: int = 1024,
    depth: int = 24,
    num_heads: int = 16,
    mlp_ratio: float = 4 * 2 / 3,
    img_size: int = 512,
    init_values: Optional[float] = None,
    qkv_bias: bool = True,
    out_indices: Sequence[int] = (7, 11, 15, 23),
    drop_path_rate: float = 0.0,
    rope: bool = True,
    pt_hw_seq_len: int = 16,
    intp_freq: bool = True,
    subln: bool = True,
    naiveswiglu: bool = True,
    use_abs_pos_emb: bool = True,
    lora: Optional[LoRASpec] = None,
    reins: Optional[ReinsSpec] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    resize_feat: bool = False,
    **_unused,  # xattn / use_checkpoint / norm_layer etc. are torch artifacts
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
        ffn_layer="swiglu_eva" if naiveswiglu else "mlp",
        init_values=init_values,
        drop_path_rate=drop_path_rate,
        ln_eps=1e-6,
        num_cls_tokens=1,
        pos_embed="learned" if use_abs_pos_emb else "none",
        attn_type="split_subln" if subln else "fused",
        use_rope=rope,
        rope_pt_seq_len=pt_hw_seq_len,
        rope_intp_freq=intp_freq,
        attn_impl=attn_impl,
        remat=remat,
        resize_feat=resize_feat,
        dtype=dtype,
    )
    return VisionTransformer(cfg=cfg, lora=lora, reins=reins)


def eva02_large(img_size: int = 512, lora: Optional[LoRASpec] = None,
                reins: Optional[ReinsSpec] = None, dtype: Any = jnp.float32,
                attn_impl: str = "auto", remat: bool = False,
                drop_path_rate: float = 0.0) -> VisionTransformer:
    return build_eva02(img_size=img_size, lora=lora, reins=reins, dtype=dtype,
                       attn_impl=attn_impl, remat=remat,
                       drop_path_rate=drop_path_rate)


def eva02_tiny_for_tests(img_size: int = 64, depth: int = 4, embed_dim: int = 32,
                         num_heads: int = 2,
                         out_indices: Sequence[int] = (0, 1, 2, 3),
                         lora: Optional[LoRASpec] = None,
                         dtype: Any = jnp.float32) -> VisionTransformer:
    return build_eva02(
        patch_size=16, embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        img_size=img_size, out_indices=out_indices, pt_hw_seq_len=4,
        lora=lora, dtype=dtype, attn_impl="xla")
