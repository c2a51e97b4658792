"""CPU-runnable smoke config: tiny ViT + MsVFM scheme on the synthetic
dataset (generate with tools/make_synthetic_dataset.py /tmp/synth_gta)."""

config = dict(
    name="smoke_tiny_ms_masked",
    crop_size=(128, 128),
    num_classes=19,
    model=dict(
        type="MsVFMEncoderDecoder",
        backbone=dict(
            type="LoRABackbone",
            backbone=dict(
                type="DinoVisionTransformer",
                patch_size=16, embed_dim=32, depth=4, num_heads=2,
                mlp_ratio=4, img_size=64, init_values=1e-05,
                out_indices=[0, 1, 2, 3],
            ),
            checkpoint="",
            Lora_config=dict(r=4, lora_alpha=4, target_modules=["qkv"],
                             lora_dropout=0.1),
        ),
        decode_head=dict(
            type="LinearHead", in_channels=[32] * 4, channels=8,
            dropout_ratio=0.1, num_classes=19, align_corners=False),
        aux_head=dict(
            type="VFMHead",
            transformer=dict(query_dim=16, n_heads=2, d_head=8, depth=1,
                             dropout=0.1, mask_ratio=0.2),
            in_channels=[32] * 4, channels=16, dropout_ratio=0.1,
            num_classes=19, align_corners=False),
        detail_loss=1.0,
        hr_crop_size=(64, 64),
        crop_coord_divisible=32,
    ),
    test_cfg=dict(
        mode="ms_slide_inference", threshold=0.968, conf=0.8,
        lr_img_size=(64, 64), stride=(32, 32), crop_size=(64, 64)),
    data=dict(
        source=dict(type="GTADataset", data_root="/tmp/synth_gta"),
        train_pipeline=dict(
            resize_scale_wh=(256, 256), crop_size=(128, 128),
            cat_max_ratio=0.75, flip_prob=0.5, photometric=True),
        rare_class_sampling=dict(class_temp=0.01, min_crop_ratio=0.5,
                                 min_pixels=50),
        batch_size=2,
        num_workers=2,
        test=[dict(type="GTADataset", data_root="/tmp/synth_gta", key="synth")],
        test_resize_wh=(128, 128),
    ),
    optimizer=dict(lr=1e-3, weight_decay=0.05, betas=(0.9, 0.999), eps=1e-8,
                   poly_power=0.9, warmup_steps=0),
    schedule=dict(max_iters=10, val_interval=0, checkpoint_interval=5,
                  max_keep_ckpts=2, log_interval=2, seed=0),
    peft=dict(enabled=True, adapter_keywords=["lora"]),
    compute=dict(dtype="float32", attn_impl="xla"),
)
