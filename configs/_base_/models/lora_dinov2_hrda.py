"""Model base: LoRA DINOv2-L + HRDA two-resolution fusion (reference configs/_base_/models/lora_dinov2_hrda.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    return dict(
        crop_size=(1024, 1024),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="HRDAEncoderDecoder",
            backbone=P.lora_backbone("dinov2", img_size=512),
            decode_head=P.hrda_head(1024),
            scales=[1, 0.5],
            hr_crop_size=(512, 512),
            crop_coord_divisible=8,
            feature_scale=0.5,
            hr_slide_inference=True,
        ),
        test_cfg=P.hrda_test_cfg(),
        peft=dict(enabled=True, adapter_keywords=["lora"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
