"""DG GTAV->Cityscapes: LoRA DINOv2-L + HRDA two-resolution fusion
(reference configs/_base_/models/lora_dinov2_hrda.py)."""

config = dict(
    _base_=["dg_lora_dinov2_ms_masked.py"],
    name="dg_lora_dinov2_hrda",
    model=dict(
        _delete_=True,
        type="HRDAEncoderDecoder",
        backbone=dict(
            type="LoRABackbone",
            backbone=dict(
                type="DinoVisionTransformer", patch_size=16, embed_dim=1024,
                depth=24, num_heads=16, mlp_ratio=4, img_size=512,
                init_values=1e-05),
            checkpoint="checkpoints/dinov2_converted.npz",
            Lora_config=dict(r=32, lora_alpha=32, target_modules=["qkv"],
                             lora_dropout=0.1),
        ),
        decode_head=dict(
            type="HRDAHead",
            seg_head=dict(type="LinearHead", in_channels=[1024] * 4,
                          channels=256, dropout_ratio=0.1, num_classes=19,
                          align_corners=False),
            single_scale_head=dict(type="AttentionHead",
                                   in_channels=[1024] * 4, channels=256,
                                   dropout_ratio=0.1, num_classes=19,
                                   align_corners=False),
            hr_loss_weight=0.1,
        ),
        scales=[1, 0.5],
        hr_crop_size=(512, 512),
        crop_coord_divisible=8,
        feature_scale=0.5,
        hr_slide_inference=True,
    ),
    test_cfg=dict(_delete_=True, mode="slide", stride=(682, 682),
                  crop_size=(1024, 1024)),
)
