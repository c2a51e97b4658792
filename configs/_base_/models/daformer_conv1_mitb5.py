"""Model base: MiT-B5 + DAFormer head, conv fusion (reference configs/_base_/models/daformer_conv1_mitb5.py; the reference uses mmseg's mit_b5 — rebuilt in vfmseg_tpu/models/backbones/mit.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    return dict(
        crop_size=(512, 512),
        num_classes=19,
        preprocessor=dict(P.PREPROCESSOR),
        model=dict(
            type="EncoderDecoder",
            backbone=P.mit_b5(),
            decode_head=dict(P.daformer_head(in_channels=(64, 128, 320, 512),
                                        channels=256), fusion="conv1"),
        ),
        test_cfg=dict(mode="whole"),
        peft=dict(enabled=False),
        compute=dict(dtype="bfloat16", attn_impl="auto"),
    )
