"""CLIP ViT-L visual tower backbone factory (+ the FPN pyramid used by the
Rein variant).

Parameterizes the unified ViT core as CLIP's visual encoder (reference
rein/models/backbones/clip.py): bias-free conv1 patchify, class-embedding
vector (with the cls-position double-add quirk, clip.py:330-341), bilinear
pos-embed resize at every forward (:334-345), pre-LN (`ln_pre`), QuickGELU
MLPs, LN eps 1e-5, no LayerScale, out_indices [7,11,15,23]. LoRA targets are
CLIP-specific: out_proj / mlp.c_fc / mlp.c_proj (lora_clip_ms_masked.py) —
normalized here to this ViT's module names (proj / fc1 / fc2).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.backbones.adapters import LoRASpec, ReinsSpec
from vfmseg_tpu.models.backbones.vit import ViTConfig, VisionTransformer

# reference target_modules name -> unified ViT linear name (CLIP uses
# out_proj/c_fc/c_proj, EVA02 uses attn.proj, SAM configs mention lin1/lin2)
LORA_TARGET_ALIASES = {
    "out_proj": "proj",
    "attn.proj": "proj",
    "mlp.c_fc": "fc1",
    "mlp.c_proj": "fc2",
    "lin1": "fc1",
    "lin2": "fc2",
}


def normalize_lora_targets(targets: Sequence[str]) -> Tuple[str, ...]:
    return tuple(LORA_TARGET_ALIASES.get(t, t) for t in targets)


@MODELS.register("CLIPVisionTransformer")
def build_clip(
    input_resolution: int = 512,
    patch_size: int = 16,
    width: int = 1024,
    layers: int = 24,
    heads: int = 16,
    out_indices: Sequence[int] = (7, 11, 15, 23),
    drop_path_rate: float = 0.0,
    output_dim: int = 512,        # accepted for config parity (embeddings head)
    get_embeddings: bool = False,  # CLIP-space embeddings not used by MsVFM
    lora: Optional[LoRASpec] = None,
    reins: Optional[ReinsSpec] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    resize_feat: bool = False,
    **_unused,
) -> VisionTransformer:
    del output_dim, get_embeddings
    cfg = ViTConfig(
        patch_size=patch_size,
        embed_dim=width,
        depth=layers,
        num_heads=heads,
        mlp_ratio=4.0,
        img_size=input_resolution,
        out_indices=tuple(out_indices),
        qkv_bias=True,
        proj_bias=True,
        ffn_layer="mlp",
        ffn_act="quick_gelu",
        init_values=None,
        drop_path_rate=drop_path_rate,
        ln_eps=1e-5,
        num_cls_tokens=1,
        pos_embed="learned",
        pos_interp="bilinear",
        cls_style="clip_embed",
        pre_norm=True,
        patch_embed_bias=False,
        attn_type="fused",
        attn_impl=attn_impl,
        remat=remat,
        resize_feat=resize_feat,
        dtype=dtype,
    )
    return VisionTransformer(cfg=cfg, lora=lora, reins=reins)


class ClipFPN(nn.Module):
    """The fpn1..fpn4 pyramid the Rein-CLIP variant applies to its 4 feature
    maps (clip.py:224-260 for patch 16; applied at reins_clip.py:58-60):
    x4 up (GN1 + 2x deconv with SyncBN+GELU between), x2 up, identity-GN,
    and 2x maxpool — turning four /16 maps into /4, /8, /16, /32."""

    embed_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        f0, f1, f2, f3 = feats
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         name="fpn1_gn")(f0)
        x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="fpn1_up1")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="fpn1_bn")(x)
        x = nn.gelu(x, approximate=False)
        f0 = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="fpn1_up2")(x)

        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         name="fpn2_gn")(f1)
        f1 = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="fpn2_up")(x)

        f2 = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                          name="fpn3_gn")(f2)

        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         name="fpn4_gn")(f3)
        f3 = nn.max_pool(x, (2, 2), strides=(2, 2))
        return (f0, f1, f2, f3)


def clip_large(input_resolution: int = 512, lora: Optional[LoRASpec] = None,
               reins: Optional[ReinsSpec] = None, dtype: Any = jnp.float32,
               attn_impl: str = "auto") -> VisionTransformer:
    return build_clip(input_resolution=input_resolution, lora=lora,
                      reins=reins, dtype=dtype, attn_impl=attn_impl)


def clip_tiny_for_tests(input_resolution: int = 64, layers: int = 4,
                        width: int = 32, heads: int = 2,
                        out_indices: Sequence[int] = (0, 1, 2, 3),
                        lora: Optional[LoRASpec] = None,
                        dtype: Any = jnp.float32) -> VisionTransformer:
    return build_clip(
        input_resolution=input_resolution, patch_size=16, width=width,
        layers=layers, heads=heads, out_indices=out_indices, lora=lora,
        dtype=dtype, attn_impl="xla")
