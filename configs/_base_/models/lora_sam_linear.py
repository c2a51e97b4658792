"""Model base: LoRA SAM + LinearHead, single-scale 512 slide (reference configs/_base_/models/lora_sam_linear.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    d = P.FEAT_DIM["sam"]
    return dict(
        crop_size=(512, 512),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="LoraBackboneEncoderDecoder",
            checkpoint=P.CHECKPOINTS["sam"],
            Lora_config=dict(r=32, lora_alpha=32,
                             target_modules=P.LORA_TARGETS["sam"],
                             lora_dropout=0.1),
            backbone=P.backbone("sam", img_size=512),
            decode_head=P.linear_head(d, channels=320),
        ),
        test_cfg=P.slide_test_cfg(crop=512, stride=320),
        peft=dict(enabled=True, adapter_keywords=["lora"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
