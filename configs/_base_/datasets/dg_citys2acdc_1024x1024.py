"""DG dataset combo: Cityscapes source, ACDC fog/night/rain/snow eval
(reference configs/dg/datasets/dg_citys2ACDC_1024x1024.py)."""


def _acdc(cond):
    return dict(type="SegDataset", data_root="data/acdc",
                img_dir=f"rgb_anon/{cond}/val", ann_dir=f"gt/{cond}/val",
                img_suffix="_rgb_anon.png",
                seg_map_suffix="_gt_labelTrainIds.png", key=f"{cond}/")


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
        val=[_acdc("fog")],
        test=[
            _acdc("fog"), _acdc("night"), _acdc("rain"), _acdc("snow"),
            # the reference combo also evals the cityscapes val split at its
            # own (2048,1024) geometry (dg_citys2ACDC_1024x1024.py
            # dataset_keys include "cityscapes/")
            dict(type="CityscapesDataset", data_root="data/cityscapes",
                 img_dir="leftImg8bit/val", ann_dir="gtFine/val",
                 key="cityscapes/", test_resize_wh=(2048, 1024)),
        ],
        test_resize_wh=(1920, 1080),
    ),
)
