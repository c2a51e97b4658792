"""DG dataset combo: Cityscapes source at 1536 crop, BDD/Mapillary eval (reference configs/dg/datasets/dg_cityscapes_1536x1536.py)."""

config = dict(
    data=dict(
        source=dict(type="CityscapesDataset", data_root="data/cityscapes"),
        train_pipeline=dict(
            resize_scale_wh=(3072, 1536),
            crop_size=(1536, 1536),
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
            dict(type="MapillaryDataset", data_root="data/mapillary", key="map"),
        ],
        test_resize_wh=(3072, 1536),
    ),
)
