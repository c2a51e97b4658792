"""CPU-runnable smoke: tiny MiT + DAFormer head on the synthetic dataset
(reference configs/_base_/models/daformer_*_mitb5 family)."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_daformer",
    model=dict(
        _delete_=True,
        type="EncoderDecoder",
        backbone=dict(type="MixVisionTransformer",
                      embed_dims=(8, 16, 32, 64), depths=(1, 1, 1, 1),
                      num_heads=(1, 2, 2, 2), sr_ratios=(4, 2, 1, 1),
                      drop_path_rate=0.0),
        decode_head=dict(type="DAFormerHead",
                         in_channels=[8, 16, 32, 64], channels=16,
                         num_classes=19, align_corners=False),
    ),
    test_cfg=dict(_delete_=True, mode="whole"),
    peft=dict(enabled=False),
)
