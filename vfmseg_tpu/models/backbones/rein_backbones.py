"""Rein-adapter backbone builders (the reference's Reins* family).

Maps the reference's per-backbone Rein wrappers onto the unified ViT core
with a ReinsSpec overlay:
  * ReinsDinoVisionTransformer — rein after every block, returns
    (4 features, query vector) (reins_dinov2.py:22-34)
  * ReinsEVA2 — same + fixed x4/x2/x0.5 feature pyramid (reins_eva_02.py:36-55)
  * ReinsSAMViT — rein only at global-attention blocks (reins_sam_vit.py:27-37)
  * ReinsCLIPVisionTransformer — rein after each resblock + FPN pyramid on
    the 4 features (reins_clip.py:53-60)

Adapter-only checkpointing (reference state_dict pruning,
reins_dinov2.py:42-49) falls out of the trainable/frozen partition: the
"reins" keyword keeps exactly these params in the trainable tree.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.backbones.adapters import ReinsSpec
from vfmseg_tpu.models.backbones.clip import ClipFPN, build_clip
from vfmseg_tpu.models.backbones.dinov2 import build_dinov2
from vfmseg_tpu.models.backbones.eva02 import build_eva02
from vfmseg_tpu.models.backbones.sam import build_sam


def reins_spec_from_config(reins_config: Dict[str, Any],
                           apply_indices=None) -> ReinsSpec:
    """reference reins_config dict (type=Reins|LoRAReins) -> ReinsSpec."""
    rc = dict(reins_config or {})
    kind = rc.pop("type", "Reins")
    return ReinsSpec(
        token_length=rc.get("token_length", 100),
        query_dims=rc.get("query_dims", 256),
        use_softmax=rc.get("use_softmax", True),
        link_token_to_query=rc.get("link_token_to_query", True),
        scale_init=rc.get("scale_init", 0.001),
        zero_mlp_delta_f=rc.get("zero_mlp_delta_f", False),
        lora_dim=rc.get("lora_dim", 16) if kind == "LoRAReins" else 0,
        apply_indices=apply_indices,
    )


@MODELS.register("ReinsDinoVisionTransformer")
def build_reins_dinov2(reins_config: Dict[str, Any], resize_feat: bool = False,
                       init_cfg=None, **backbone_kwargs):
    del init_cfg  # weight loading is the converters' job
    reins = reins_spec_from_config(reins_config)
    return build_dinov2(**backbone_kwargs, reins=reins, resize_feat=resize_feat)


@MODELS.register("ReinsEVA2")
def build_reins_eva02(reins_config: Dict[str, Any], resize_feat: bool = True,
                      init_cfg=None, **backbone_kwargs):
    del init_cfg
    reins = reins_spec_from_config(reins_config)
    return build_eva02(**backbone_kwargs, reins=reins, resize_feat=resize_feat)


@MODELS.register("ReinsSAMViT")
def build_reins_sam(reins_config: Dict[str, Any], resize_feat: bool = True,
                    init_cfg=None, **backbone_kwargs):
    del init_cfg
    global_idx = tuple(backbone_kwargs.get("global_attn_indexes", (7, 15, 23, 31)))
    reins = reins_spec_from_config(reins_config, apply_indices=global_idx)
    return build_sam(**backbone_kwargs, reins=reins, resize_feat=resize_feat)


class ReinsCLIPWithFPN(nn.Module):
    """CLIP + Rein + the fpn1..4 pyramid applied to the 4 feature maps
    (reins_clip.py:58-60). Trains ["fpn", "reins"] (:87-90) — both keywords
    are adapter keywords for the PEFT partition."""

    vit: nn.Module
    fpn: ClipFPN

    def __call__(self, x, deterministic: bool = True):
        out = self.vit(x, deterministic=deterministic)
        queries = None
        if isinstance(out, tuple) and len(out) == 2 and not hasattr(out[0], "shape"):
            feats, queries = out
        else:
            feats = out
        feats = self.fpn(feats, train=not deterministic)
        return (feats, queries) if queries is not None else feats


@MODELS.register("ReinsCLIPVisionTransformer")
def build_reins_clip(reins_config: Dict[str, Any], init_cfg=None,
                     **backbone_kwargs):
    del init_cfg
    reins = reins_spec_from_config(reins_config)
    dtype = backbone_kwargs.get("dtype", jnp.float32)
    vit = build_clip(**backbone_kwargs, reins=reins)
    return ReinsCLIPWithFPN(
        vit=vit, fpn=ClipFPN(embed_dim=backbone_kwargs.get("width", 1024),
                             dtype=dtype))
