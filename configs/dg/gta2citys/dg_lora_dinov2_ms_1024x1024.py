"""DG GTAV->Cityscapes experiment: lora_dinov2_ms on dg_gta2citys_1024x1024 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/lora_dinov2_ms.py",
        "../../_base_/datasets/dg_gta2citys_1024x1024.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="dg_lora_dinov2_ms_1024x1024",
)
