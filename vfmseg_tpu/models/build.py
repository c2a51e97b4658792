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


def _head_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    kw = {k: v for k, v in cfg.items() if k in _HEAD_KEYS}
    if "in_channels" in kw:
        kw["in_channels"] = tuple(kw["in_channels"])
    return kw


def _build_head(cfg: Dict[str, Any], dtype, attn_impl: str):
    from vfmseg_tpu.models.heads.attention_head import AttentionHead
    from vfmseg_tpu.models.heads.daformer import DAFormerHead
    from vfmseg_tpu.models.heads.dino_head import DINOHead
    from vfmseg_tpu.models.heads.segformer import SegformerHead

    cfg = dict(cfg)
    kind = cfg.pop("type")
    cfg.pop("in_index", None)
    cfg.pop("norm_cfg", None)
    cfg.pop("loss_decode", None)
    kw = _head_kwargs(cfg)
    if kind == "LinearHead":
        return LinearHead(dtype=dtype, **kw)
    if kind == "VFMHead":
        return VFMHead(transformer=dict(cfg.get("transformer", {})), dtype=dtype,
                       attn_impl=attn_impl, **kw)
    if kind == "AttentionHead":
        return AttentionHead(dtype=dtype, **kw)
    if kind == "SegformerHead":
        return SegformerHead(dtype=dtype, **kw)
    if kind == "DAFormerHead":
        if "fusion" in cfg:
            kw["fusion"] = cfg["fusion"]
        if "dilations" in cfg:
            kw["dilations"] = tuple(cfg["dilations"])
        return DAFormerHead(dtype=dtype, **kw)
    if kind == "DINOhead":
        return DINOHead(dtype=dtype, attn_impl=attn_impl, **kw)
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


@MODELS.register("FrozenBackboneEncoderDecoder")
def build_frozen_encoder_decoder(**kwargs):
    """frozen_encoder_decoder.py:19-34."""
    model = build_encoder_decoder(**kwargs)
    return model.clone(frozen_backbone=True)


@MODELS.register("LoraBackboneEncoderDecoder")
def build_lora_encoder_decoder(backbone: Dict[str, Any], Lora_config: dict,
                               **kwargs):
    """Lora_encoder_decoder.py:14-43: EncoderDecoder that LoRA-wraps its own
    backbone (same effect as LoRABackbone)."""
    wrapped = dict(type="LoRABackbone", backbone=dict(backbone),
                   Lora_config=dict(Lora_config))
    return build_encoder_decoder(backbone=wrapped, **kwargs)


@MODELS.register("HRDAEncoderDecoder")
def build_hrda_encoder_decoder(
    backbone: Dict[str, Any],
    decode_head: Dict[str, Any],
    scales=(1, 0.5),
    hr_crop_size=(512, 512),
    crop_coord_divisible: int = 8,
    hr_slide_inference: bool = True,
    feature_scale: float = 0.5,
    frozen: bool = False,
    data_preprocessor: Optional[dict] = None,
    train_cfg: Optional[dict] = None,
    test_cfg: Optional[dict] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    **_unused,
):
    from vfmseg_tpu.models.segmentors.hrda import HRDAEncoderDecoder, HRDAHead

    del data_preprocessor, train_cfg, test_cfg, hr_slide_inference, feature_scale
    hc = dict(decode_head)
    head = HRDAHead(
        seg_head=_build_head(dict(hc["seg_head"]), dtype, attn_impl),
        scale_attention=_build_head(dict(hc["single_scale_head"]), dtype,
                                    attn_impl),
        lr_loss_weight=hc.get("lr_loss_weight", 0.0),
        hr_loss_weight=hc.get("hr_loss_weight", 0.1),
    )
    return HRDAEncoderDecoder(
        backbone=MODELS.build(dict(backbone), dtype=dtype, attn_impl=attn_impl),
        decode_head=head,
        scales=tuple(sorted(scales)),
        hr_crop_size=tuple(hr_crop_size),
        crop_coord_divisible=crop_coord_divisible,
        frozen_backbone=frozen,
    )


@MODELS.register("FrozenHRDAEncoderDecoder")
def build_frozen_hrda_encoder_decoder(**kwargs):
    """hrda_encoder_decoder.py:450-464 (backbone no-grad)."""
    kwargs["frozen"] = True
    return build_hrda_encoder_decoder(**kwargs)


@MODELS.register("MultiScaleEncoderDecoder")
def build_multiscale_encoder_decoder(
    backbone: Dict[str, Any],
    decode_head: Dict[str, Any],
    hr_crop_size=(512, 512),
    crop_coord_divisible: int = 32,
    detail_loss: float = 1.0,
    data_preprocessor: Optional[dict] = None,
    train_cfg: Optional[dict] = None,
    test_cfg: Optional[dict] = None,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    **_unused,
):
    from vfmseg_tpu.models.segmentors.multiscale import MultiScaleEncoderDecoder

    del data_preprocessor, train_cfg, test_cfg
    return MultiScaleEncoderDecoder(
        backbone=MODELS.build(dict(backbone), dtype=dtype, attn_impl=attn_impl),
        decode_head=_build_head(dict(decode_head), dtype, attn_impl),
        hr_crop_size=tuple(hr_crop_size),
        crop_coord_divisible=crop_coord_divisible,
        detail_loss=detail_loss,
    )


@MODELS.register("DomainGeneral")
def build_domain_general(model_cfg: Dict[str, Any],
                         train_cfg: Optional[dict] = None,
                         dtype: Any = jnp.float32,
                         attn_impl: str = "auto",
                         **kwargs):
    """DG wrapper (DG.py:18-25): color_jitter_strength/probability, blur."""
    from vfmseg_tpu.models.algorithms.dg import DomainGeneral

    del train_cfg
    inner = MODELS.build(dict(model_cfg), dtype=dtype, attn_impl=attn_impl)
    accepted = {
        "enable_mask_loss", "color_jitter_strength",
        "color_jitter_probability", "blur", "mask_ratio", "mask_block_size",
        "lamda_mask",
    }
    return DomainGeneral(model=inner,
                         **{k: v for k, v in kwargs.items() if k in accepted})


def build_segmentor(model_cfg: Dict[str, Any], dtype=jnp.float32,
                    attn_impl: str = "auto"):
    return MODELS.build(dict(model_cfg), dtype=dtype, attn_impl=attn_impl)
