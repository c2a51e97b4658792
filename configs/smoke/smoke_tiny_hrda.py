"""CPU-runnable smoke: tiny HRDA two-resolution fusion on the synthetic
dataset (reference configs/_base_/models/*hrda* family)."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_hrda",
    model=dict(
        _delete_=True,
        type="HRDAEncoderDecoder",
        backbone=dict(
            type="LoRABackbone",
            backbone=dict(
                type="DinoVisionTransformer", patch_size=16, embed_dim=32,
                depth=4, num_heads=2, img_size=64, init_values=1e-05,
                out_indices=[0, 1, 2, 3]),
            checkpoint="",
            Lora_config=dict(r=4, lora_alpha=4, target_modules=["qkv"],
                             lora_dropout=0.1),
        ),
        decode_head=dict(
            type="HRDAHead",
            seg_head=dict(type="LinearHead", in_channels=[32] * 4, channels=8,
                          num_classes=19, align_corners=False),
            single_scale_head=dict(type="AttentionHead",
                                   in_channels=[32] * 4, channels=8,
                                   num_classes=19, align_corners=False),
            hr_loss_weight=0.1,
        ),
        scales=[1, 0.5],
        hr_crop_size=(64, 64),
        crop_coord_divisible=8,
    ),
    test_cfg=dict(_delete_=True, mode="slide", stride=(64, 64),
                  crop_size=(128, 128)),
)
