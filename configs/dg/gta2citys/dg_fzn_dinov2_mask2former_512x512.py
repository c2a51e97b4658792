"""DG GTAV->Cityscapes experiment: dinov2_mask2former_frozen on dg_gta2citys_512x512 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/dinov2_mask2former_frozen.py",
        "../../_base_/datasets/dg_gta2citys_512x512.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="dg_fzn_dinov2_mask2former_512x512",
)
