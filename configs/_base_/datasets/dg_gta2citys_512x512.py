"""DG dataset combo: GTAV source, Cityscapes/BDD/Mapillary eval at 512 crop (reference configs/dg/datasets/dg_gta2citys_512x512.py)."""

config = dict(
    data=dict(
        source=dict(type="GTADataset", data_root="data/gta"),
        train_pipeline=dict(
            # the reference's 512 GTA base trains with shortest-edge scale
            # jitter over 16 scales, not a fixed resize (reference
            # configs/_base_/datasets/gta_512x512.py:8-14; the commented-out
            # fixed Resize(1280,720) there is behind the jitter)
            scale_jitter_scales=[int(512 * x * 0.1) for x in range(5, 21)],
            scale_jitter_max_size=2048,
            resize_scale_wh=(1280, 720),
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
            dict(type="CityscapesDataset", data_root="data/cityscapes",
                 img_dir="leftImg8bit/val", ann_dir="gtFine/val", key="citys"),
        ],
        test=[
            dict(type="CityscapesDataset", data_root="data/cityscapes",
                 img_dir="leftImg8bit/val", ann_dir="gtFine/val", key="citys"),
            dict(type="BDD100KDataset", data_root="data/bdd100k", key="bdd",
                 # bdd100k_512x512.py:15: BDD evals at its native scale
                 test_resize_wh=(1280, 720)),
            dict(type="MapillaryDataset", data_root="data/mapillary", key="map"),
        ],
        test_resize_wh=(1024, 512),
    ),
)
