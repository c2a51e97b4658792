"""DG GTAV->Cityscapes experiment: lora_dinov2_SegFormer on dg_gta2citys_512x512 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/lora_dinov2_SegFormer.py",
        "../../_base_/datasets/dg_gta2citys_512x512.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="dg_lora_dinov2_segformer",
)
