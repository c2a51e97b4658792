"""DG Cityscapes -> ACDC (fog/night/rain/snow): per-condition evaluation
grouped by path substring (reference configs/dg/datasets/
dg_citys2ACDC_1024x1024.py:17-58 + DGIoUMetric dataset_keys)."""

config = dict(
    _base_=["../citys2bdd/dg_lora_dinov2_ms_masked_citys.py"],
    name="dg_lora_dinov2_ms_masked_acdc",
    data=dict(
        test=[
            dict(type="SegDataset", data_root="data/acdc",
                 img_dir="rgb_anon/fog/val", ann_dir="gt/fog/val",
                 img_suffix="_rgb_anon.png",
                 seg_map_suffix="_gt_labelTrainIds.png", key="fog/"),
            dict(type="SegDataset", data_root="data/acdc",
                 img_dir="rgb_anon/night/val", ann_dir="gt/night/val",
                 img_suffix="_rgb_anon.png",
                 seg_map_suffix="_gt_labelTrainIds.png", key="night/"),
            dict(type="SegDataset", data_root="data/acdc",
                 img_dir="rgb_anon/rain/val", ann_dir="gt/rain/val",
                 img_suffix="_rgb_anon.png",
                 seg_map_suffix="_gt_labelTrainIds.png", key="rain/"),
            dict(type="SegDataset", data_root="data/acdc",
                 img_dir="rgb_anon/snow/val", ann_dir="gt/snow/val",
                 img_suffix="_rgb_anon.png",
                 seg_map_suffix="_gt_labelTrainIds.png", key="snow/"),
        ],
        test_resize_wh=(1920, 1080),
    ),
)
