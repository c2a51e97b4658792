"""DG dataset combo: Cityscapes source at 512 crop, BDD/Mapillary eval (reference configs/dg/datasets/dg_cityscapes_512x512.py)."""

config = dict(
    data=dict(
        source=dict(type="CityscapesDataset", data_root="data/cityscapes"),
        train_pipeline=dict(
            resize_scale_wh=(1024, 512),
            crop_size=(512, 512),
            cat_max_ratio=0.75,
            flip_prob=0.5,
            photometric=True,
        ),
        rare_class_sampling=dict(class_temp=0.01, min_crop_ratio=0.5,
                                 min_pixels=3000),
        batch_size=2,
        num_workers=4,
        val=[
            dict(type="BDD100KDataset", data_root="data/bdd100k", key="bdd",
                 # bdd100k_512x512.py:15: BDD evals at its native scale
                 test_resize_wh=(1280, 720)),
        ],
        test=[
            dict(type="BDD100KDataset", data_root="data/bdd100k", key="bdd",
                 # bdd100k_512x512.py:15: BDD evals at its native scale
                 test_resize_wh=(1280, 720)),
            dict(type="MapillaryDataset", data_root="data/mapillary", key="map"),
        ],
        test_resize_wh=(1024, 512),
    ),
)
