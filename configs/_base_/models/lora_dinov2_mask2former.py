"""Model base: LoRA DINOv2-L + Mask2Former set-prediction head (reference configs/_base_/models/lora_dinov2_mask2former.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    return dict(
        crop_size=(512, 512),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="LoraBackboneEncoderDecoder",
            checkpoint=P.CHECKPOINTS["dinov2"],
            Lora_config=dict(r=32, lora_alpha=32,
                             target_modules=P.LORA_TARGETS["dinov2"],
                             lora_dropout=0.1),
            backbone=P.backbone("dinov2", img_size=512),
            decode_head=P.mask2former_head(1024, rein=False),
        ),
        test_cfg=P.slide_test_cfg(crop=512, stride=341),
        peft=dict(enabled=True, adapter_keywords=["lora"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
