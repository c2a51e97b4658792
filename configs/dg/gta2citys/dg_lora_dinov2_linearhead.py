"""DG GTAV->Cityscapes: LoRA DINOv2-L + plain LinearHead (single-scale
baseline, reference configs/dg/gta2citys/dg_lora_dinov2_linearhead.py)."""

config = dict(
    _base_=["dg_lora_dinov2_ms_masked.py"],
    name="dg_lora_dinov2_linearhead",
    crop_size=(512, 512),
    model=dict(
        _delete_=True,
        type="EncoderDecoder",
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
            type="LinearHead", in_channels=[1024] * 4, channels=256,
            dropout_ratio=0.1, num_classes=19, align_corners=False),
    ),
    data=dict(train_pipeline=dict(crop_size=(512, 512))),
    test_cfg=dict(_delete_=True, mode="slide", crop_size=(512, 512),
                  stride=(341, 341)),
)
