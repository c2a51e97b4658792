"""Model base: frozen DINOv2-L + SegformerHead (reference configs/_base_/models/dinov2_SegFormer_frozen.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    return dict(
        crop_size=(512, 512),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="FrozenBackboneEncoderDecoder",
            backbone=P.backbone("dinov2", img_size=512),
            decode_head=P.segformer_head(1024),
        ),
        test_cfg=P.slide_test_cfg(crop=512, stride=341),
        peft=dict(enabled=True, adapter_keywords=[]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
