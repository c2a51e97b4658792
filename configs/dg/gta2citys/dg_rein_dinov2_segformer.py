"""DG GTAV->Cityscapes: Rein DINOv2-L + SegformerHead (reference
configs/_base_/models/rein_dinov2_segformer family)."""

config = dict(
    _base_=["dg_rein_dinov2_mask2former.py"],
    name="dg_rein_dinov2_segformer",
    model=dict(
        decode_head=dict(
            _delete_=True,
            type="SegformerHead",
            in_channels=[1024] * 4,
            channels=256,
            dropout_ratio=0.1,
            num_classes=19,
            align_corners=False,
        ),
        backbone=dict(resize_feat=False),
    ),
)
