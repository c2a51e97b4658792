"""UDA GTAV->Cityscapes: DACS self-training on rein_dinov2_hrda (reference
configs/uda/uda_rein_dinov2_hrda_1024x1024.py)."""

config = dict(
    _base_=[
        "../_base_/models/rein_dinov2_hrda.py",
        "../_base_/datasets/dg_gta2citys_1024x1024.py",
        "../_base_/schedules/default_40k.py",
    ],
    name="uda_rein_dinov2_hrda_1024x1024",
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
