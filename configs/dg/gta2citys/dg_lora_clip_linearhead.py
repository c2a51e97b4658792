"""DG GTAV->Cityscapes experiment: lora_clip_linear on dg_gta2citys_512x512 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/lora_clip_linear.py",
        "../../_base_/datasets/dg_gta2citys_512x512.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="dg_lora_clip_linearhead",
)
