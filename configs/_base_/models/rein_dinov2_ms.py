"""Model base: Rein DINOv2-L under the MsVFM two-scale plain scheme (reference configs/_base_/models/rein_dinov2_ms.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    return dict(
        crop_size=(1024, 1024),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="MsVFMEncoderDecoder",
            backbone=P.reins_backbone("dinov2", img_size=512,
                                      resize_feat=False),
            decode_head=P.linear_head(1024),
            aux_head=P.vfm_aux_head(1024, masked=False),
            detail_loss=1.0,
            scales=[1, 0.5],
            hr_crop_size=(512, 512),
            crop_coord_divisible=32,
            feature_scale=0.5,
        ),
        test_cfg=P.ms_test_cfg(masked=False),
        peft=dict(enabled=True, adapter_keywords=["reins"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
