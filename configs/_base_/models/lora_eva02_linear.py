"""Model base: LoRA EVA02 + LinearHead, single-scale 512 slide (reference configs/_base_/models/lora_eva02_linear.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    d = P.FEAT_DIM["eva02"]
    return dict(
        crop_size=(512, 512),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="LoraBackboneEncoderDecoder",
            checkpoint=P.CHECKPOINTS["eva02"],
            Lora_config=dict(r=32, lora_alpha=32,
                             target_modules=P.LORA_TARGETS["eva02"],
                             lora_dropout=0.1),
            backbone=P.backbone("eva02", img_size=512),
            decode_head=P.linear_head(d, channels=256),
        ),
        test_cfg=P.slide_test_cfg(crop=512, stride=320),
        peft=dict(enabled=True, adapter_keywords=["lora"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
