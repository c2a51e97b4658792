"""DG GTAV->Cityscapes experiment: dinov2_hrda_frozen on dg_gta2citys_1024x1024 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/dinov2_hrda_frozen.py",
        "../../_base_/datasets/dg_gta2citys_1024x1024.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="dg_fzn_dinov2_hrda_1024x1024",
)
