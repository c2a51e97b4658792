"""DG Cityscapes -> {BDD100K + Mapillary}: the second headline benchmark
(reference configs/dg/citys2bdd + Readme 71.62% avg mIoU claim)."""

config = dict(
    _base_=["../gta2citys/dg_lora_dinov2_ms_masked.py"],
    name="dg_lora_dinov2_ms_masked_citys",
    data=dict(
        source=dict(
            _delete_=True,
            type="CityscapesDataset",
            data_root="data/cityscapes",
            img_dir="leftImg8bit/train",
            ann_dir="gtFine/train",
        ),
        train_pipeline=dict(resize_scale_wh=(2048, 1024)),
        test=[
            dict(type="BDD100KDataset", data_root="data/bdd100k", key="bdd"),
            dict(type="MapillaryDataset", data_root="data/mapillary",
                 key="map"),
        ],
    ),
)
