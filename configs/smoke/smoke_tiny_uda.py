"""Smoke: DACS UDA on the tiny linear model with synthetic source+target."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_uda",
    model=dict(
        _delete_=True,
        type="EncoderDecoder",
        backbone=dict(
            type="DinoVisionTransformer", patch_size=16, embed_dim=32,
            depth=4, num_heads=2, img_size=64, out_indices=[0, 1, 2, 3]),
        decode_head=dict(type="LinearHead", in_channels=[32] * 4, channels=8,
                         num_classes=19),
    ),
    uda=dict(type="DACS", pseudo_weight_ignore_top=4,
             pseudo_weight_ignore_bottom=8),
    data=dict(
        target=dict(type="GTADataset", data_root="/tmp/synth_gta"),
    ),
    test_cfg=dict(_delete_=True, mode="whole"),
    peft=dict(enabled=False),
)
