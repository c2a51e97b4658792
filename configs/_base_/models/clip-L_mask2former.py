"""Model base: Rein CLIP + ReinMask2FormerHead (reference configs/_base_/models/clip-L_mask2former.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    d = P.FEAT_DIM["clip"]
    return dict(
        crop_size=(512, 512),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="EncoderDecoder",
            backbone=P.reins_backbone("clip", img_size=512,
                                      resize_feat=True),
            decode_head=P.mask2former_head(d, rein=True),
        ),
        test_cfg=P.slide_test_cfg(crop=512, stride=341),
        # ReinsCLIP trains the FPN pyramid alongside the adapters
        # (reference reins_clip.py:87-90)
        peft=dict(enabled=True, adapter_keywords=["reins", "fpn"]),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
