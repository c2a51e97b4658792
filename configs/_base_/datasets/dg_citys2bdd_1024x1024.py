"""DG dataset combo: Cityscapes source, BDD100K eval (reference configs/dg/datasets/dg_citys2bdd_1024x1024.py)."""

config = dict(
    data=dict(
        source=dict(type="CityscapesDataset", data_root="data/cityscapes"),
        train_pipeline=dict(
            resize_scale_wh=(2048, 1024),
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
            dict(type="BDD100KDataset", data_root="data/bdd100k", key="bdd"),
        ],
        test=[
            dict(type="BDD100KDataset", data_root="data/bdd100k", key="bdd"),
        ],
        # reference bdd100k_1024x1024.py:15 evals BDD at scale (2048,1024)
        # keep_ratio=True -> 1280x720 frames become 1820x1024
        test_resize_wh=(2048, 1024),
    ),
)
