"""Model base: LoRA EVA02 under the MsVFM two-scale masked-context scheme (reference configs/_base_/models/lora_eva02_ms_masked.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    d = P.FEAT_DIM["eva02"]
    return dict(
        crop_size=(1024, 1024),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="MsVFMEncoderDecoder",
            backbone=P.lora_backbone("eva02", img_size=512),
            decode_head=P.linear_head(d, channels=256),
            aux_head=P.vfm_aux_head(d, channels=256, masked=True),
            detail_loss=1.0,
            scales=[1, 0.5],
            hr_crop_size=(512, 512),
            crop_coord_divisible=32,
            feature_scale=0.5,
        ),
        test_cfg=P.ms_test_cfg(masked=True),
        peft=dict(enabled=True, adapter_keywords=["lora"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
