"""Model base: Rein (LoRAReins) on frozen DINOv2-L + LinearHead (reference configs/_base_/models/rein_dinov2_linear.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    return dict(
        crop_size=(512, 512),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="EncoderDecoder",
            backbone=P.reins_backbone("dinov2", img_size=512,
                                      resize_feat=False),
            decode_head=P.linear_head(1024),
        ),
        test_cfg=P.slide_test_cfg(crop=512, stride=320),
        peft=dict(enabled=True, adapter_keywords=["reins"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
