"""DG GTAV->Cityscapes: Rein (LoRAReins token adapters) on frozen DINOv2-L
with the ReinMask2FormerHead (reference
configs/_base_/models/rein_dinov2_mask2former.py + dg dataset bases)."""

config = dict(
    _base_=["dg_lora_dinov2_ms_masked.py"],
    name="dg_rein_dinov2_mask2former",
    crop_size=(512, 512),
    model=dict(
        _delete_=True,
        type="EncoderDecoder",
        backbone=dict(
            type="ReinsDinoVisionTransformer",
            resize_feat=True,
            reins_config=dict(
                type="LoRAReins",
                token_length=100,
                lora_dim=16,
                link_token_to_query=True,
            ),
            patch_size=16,
            embed_dim=1024,
            depth=24,
            num_heads=16,
            mlp_ratio=4,
            img_size=512,
            init_values=1e-05,
        ),
        decode_head=dict(
            type="ReinMask2FormerHead",
            replace_query_feat=True,
            in_channels=[1024, 1024, 1024, 1024],
            strides=[4, 8, 16, 32],
            feat_channels=256,
            out_channels=256,
            num_classes=19,
            num_queries=100,
            num_transformer_feat_level=3,
            align_corners=False,
            transformer_decoder=dict(num_layers=9),
            train_cfg=dict(num_points=12544, oversample_ratio=3.0,
                           importance_sample_ratio=0.75),
        ),
    ),
    data=dict(
        train_pipeline=dict(crop_size=(512, 512)),
    ),
    test_cfg=dict(
        _delete_=True,
        mode="slide",
        crop_size=(512, 512),
        stride=(341, 341),
    ),
    peft=dict(enabled=True, adapter_keywords=["reins"]),
)
