"""DG GTAV->Cityscapes experiment: rein_dinov2_hrda on dg_gta2citys_1024x1024 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/rein_dinov2_hrda.py",
        "../../_base_/datasets/dg_gta2citys_1024x1024.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="dg_rein_dinov2_hrda_1024x1024",
)
