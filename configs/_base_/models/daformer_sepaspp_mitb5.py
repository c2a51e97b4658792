"""Model base: MiT-B5 + DAFormer head with separable-ASPP context fusion (reference configs/_base_/models/daformer_sepaspp_mitb5.py)."""

from vfmseg_tpu.models import presets as P


def get_config():
    return dict(
        _base_=["daformer_conv1_mitb5.py"],
        model=dict(
            decode_head=dict(fusion="aspp", dilations=(1, 6, 12, 18)),
        ),
    )
