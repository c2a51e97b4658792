"""Smoke: DomainGeneral wrapper with the masked-image consistency branch
enabled (reference DG.py mask_loss, enable_mask_loss=True)."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_dg_maskloss",
    model=dict(
        _delete_=True,
        type="DomainGeneral",
        enable_mask_loss=True,
        color_jitter_strength=0.25,
        color_jitter_probability=0.2,
        blur=True,
        model_cfg=dict(
            type="EncoderDecoder",
            backbone=dict(
                type="DinoVisionTransformer", patch_size=16, embed_dim=32,
                depth=4, num_heads=2, img_size=64, out_indices=[0, 1, 2, 3]),
            decode_head=dict(type="LinearHead", in_channels=[32] * 4,
                             channels=8, num_classes=19),
        ),
    ),
    test_cfg=dict(_delete_=True, mode="whole"),
    peft=dict(enabled=False),
)
