"""DG GTAV->Cityscapes experiment: clip-L_mask2former on dg_gta2citys_512x512 (reference
configs/dg/gta2citys/ family)."""

config = dict(
    _base_=[
        "../../_base_/models/clip-L_mask2former.py",
        "../../_base_/datasets/dg_gta2citys_512x512.py",
        "../../_base_/schedules/default_40k.py",
    ],
    name="rein_clip_l_mask2former_512x512_bs1x4",
    # reference trains 1 img x 4 GPUs; here: global batch 4
    data=dict(batch_size=4),
)
