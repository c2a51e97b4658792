"""UDA GTAV->Cityscapes: DACS self-training on Rein-DINOv2 + Mask2Former
(reference configs/uda/uda_rein_dinov2_mask2former_512x512.py:12-24)."""

config = dict(
    _base_=["../dg/gta2citys/dg_rein_dinov2_mask2former.py"],
    name="uda_rein_dinov2_mask2former_512x512",
    uda=dict(
        type="DACS",
        alpha=0.999,
        pseudo_threshold=0.968,
        pseudo_weight_ignore_top=15,
        pseudo_weight_ignore_bottom=120,
        color_jitter_strength=0.25,
        color_jitter_probability=0.2,
        blur=True,
    ),
    data=dict(
        target=dict(
            type="CityscapesDataset",
            data_root="data/cityscapes",
            img_dir="leftImg8bit/train",
            ann_dir="gtFine/train",
        ),
    ),
)
