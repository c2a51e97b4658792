"""DG GTAV->Cityscapes experiment: rein_dinov2_linear on dg_gta2citys_512x512 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/rein_dinov2_linear.py",
        "../../_base_/datasets/dg_gta2citys_512x512.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="dg_rein_dinov2_linearhead",
)
