"""Config-dict -> model builders (the reference registry `type=` surface).

Maps the reference's mmengine model configs (e.g.
configs/_base_/models/lora_dinov2_ms_masked.py) onto our flax modules, so a
config written against the reference's schema builds the equivalent
TPU-native model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.heads.linear_head import LinearHead
from vfmseg_tpu.models.heads.vfm_head import VFMHead
from vfmseg_tpu.models.segmentors.encoder_decoder import EncoderDecoder
from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor

# import for registration side effects (reference rein/__init__.py idiom)
import vfmseg_tpu.models.backbones  # noqa: F401


_HEAD_KEYS = {
    "in_channels", "channels", "num_classes", "dropout_ratio", "align_corners",
    "dtype",
}


def _build_head(cfg: Dict[str, Any], dtype, attn_impl: str):
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cfg.pop("in_index", None)
    cfg.pop("norm_cfg", None)
    cfg.pop("loss_decode", None)
    if kind == "LinearHead":
        kw = {k: v for k, v in cfg.items() if k in _HEAD_KEYS}
        if "in_channels" in kw:
            kw["in_channels"] = tuple(kw["in_channels"])
        return LinearHead(dtype=dtype, **kw)
    if kind == "VFMHead":
        kw = {k: v for k, v in cfg.items() if k in _HEAD_KEYS}
        if "in_channels" in kw:
            kw["in_channels"] = tuple(kw["in_channels"])
        return VFMHead(transformer=dict(cfg.get("transformer", {})), dtype=dtype,
                       attn_impl=attn_impl, **kw)
    return MODELS.build(cfg | {"type": kind})


@MODELS.register("MsVFMEncoderDecoder")
def build_ms_vfm_encoder_decoder(
    backbone: Dict[str, Any],
    decode_head: Dict[str, Any],
    aux_head: Dict[str, Any],
    hr_crop_size=(512, 512),
    crop_coord_divisible: int = 32,
    detail_loss: float = 1.0,
    scales=(1, 0.5),                 # config parity; scheme is fixed 2-scale
    feature_scale: float = 0.5,      # config parity
    data_preprocessor: Optional[dict] = None,
    train_cfg: Optional[dict] = None,
    test_cfg: Optional[dict] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    **_unused,
) -> MsVFMSegmentor:
    del scales, feature_scale, data_preprocessor, train_cfg
    model = MsVFMSegmentor(
        backbone=MODELS.build(dict(backbone), dtype=dtype, attn_impl=attn_impl),
        decode_head=_build_head(decode_head, dtype, attn_impl),
        aux_head=_build_head(aux_head, dtype, attn_impl),
        hr_crop_size=tuple(hr_crop_size),
        crop_coord_divisible=crop_coord_divisible,
        detail_loss=detail_loss,
    )
    # stash test cfg for the eval driver (plain attribute, module is frozen
    # dataclass — use object.__setattr__ pattern via metadata dict instead)
    return model


@MODELS.register("EncoderDecoder")
def build_encoder_decoder(
    backbone: Dict[str, Any],
    decode_head: Dict[str, Any],
    data_preprocessor: Optional[dict] = None,
    train_cfg: Optional[dict] = None,
    test_cfg: Optional[dict] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    **_unused,
):
    del data_preprocessor, train_cfg, test_cfg
    backbone_mod = MODELS.build(dict(backbone), dtype=dtype, attn_impl=attn_impl)
    head_type = decode_head.get("type", "")
    if "Mask2Former" in head_type:
        from vfmseg_tpu.models.heads.mask2former import Mask2FormerHead
        from vfmseg_tpu.models.segmentors.maskformer import MaskFormerSegmentor

        hc = dict(decode_head)
        num_classes = hc.get("num_classes", 19)
        train_cfg_h = hc.get("train_cfg", {}) or {}
        head = Mask2FormerHead(
            num_classes=num_classes,
            num_queries=hc.get("num_queries", 100),
            feat_channels=hc.get("feat_channels", 256),
            num_transformer_feat_level=hc.get("num_transformer_feat_level", 3),
            num_decoder_layers=hc.get("transformer_decoder", {}).get(
                "num_layers", 9),
            replace_query_feat=hc.get("replace_query_feat", False),
            rein_queries=head_type.startswith("Rein"),
            dtype=dtype,
        )
        return MaskFormerSegmentor(
            backbone=backbone_mod, decode_head=head, num_classes=num_classes,
            num_points=train_cfg_h.get("num_points", 12544))
    return EncoderDecoder(
        backbone=backbone_mod,
        decode_head=_build_head(decode_head, dtype, attn_impl),
    )


def build_segmentor(model_cfg: Dict[str, Any], dtype=jnp.float32,
                    attn_impl: str = "auto"):
    return MODELS.build(dict(model_cfg), dtype=dtype, attn_impl=attn_impl)
