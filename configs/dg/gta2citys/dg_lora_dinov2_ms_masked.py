"""Headline DG experiment: GTAV -> Cityscapes(+BDD100K+Mapillary), LoRA
DINOv2-L with two-scale masked-context training (reference
configs/dg/gta2citys/dg_lora_dinov2_ms_masked.py)."""

config = dict(
    _base_=["../../_base_/models/lora_dinov2_ms_masked.py"],
    name="dg_lora_dinov2_ms_masked",
    data=dict(
        source=dict(
            type="GTADataset",
            data_root="data/gta",
        ),
        train_pipeline=dict(
            resize_scale_wh=(2560, 1440),
            crop_size=(1024, 1024),
            cat_max_ratio=0.75,
            flip_prob=0.5,
            photometric=True,
        ),
        rare_class_sampling=dict(class_temp=0.01, min_crop_ratio=2.0,
                                 min_pixels=3000),
        batch_size=2,
        num_workers=4,
        val=[
            dict(type="CityscapesDataset", data_root="data/cityscapes",
                 img_dir="leftImg8bit/val", ann_dir="gtFine/val",
                 key="citys"),
        ],
        test=[
            dict(type="CityscapesDataset", data_root="data/cityscapes",
                 img_dir="leftImg8bit/val", ann_dir="gtFine/val",
                 key="citys"),
            dict(type="BDD100KDataset", data_root="data/bdd100k", key="bdd"),
            dict(type="MapillaryDataset", data_root="data/mapillary",
                 key="map"),
        ],
        test_resize_wh=(2048, 1024),
    ),
    optimizer=dict(
        lr=1e-4,
        weight_decay=0.05,
        betas=(0.9, 0.999),
        eps=1e-8,
        poly_power=0.9,
        warmup_steps=0,
    ),
    schedule=dict(
        max_iters=40000,
        val_interval=8000,
        checkpoint_interval=4000,
        max_keep_ckpts=3,
        log_interval=50,
        seed=0,
    ),
    peft=dict(enabled=True, adapter_keywords=["lora"]),
    compute=dict(dtype="bfloat16", attn_impl="auto"),
)
