"""Smoke: tiny Rein-DINOv2 + Mask2Former head (set-prediction loss)."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_rein_m2f",
    crop_size=(128, 128),
    model=dict(
        _delete_=True,
        type="EncoderDecoder",
        backbone=dict(
            type="ReinsDinoVisionTransformer",
            resize_feat=True,
            reins_config=dict(type="LoRAReins", token_length=10, lora_dim=4,
                              query_dims=32),
            patch_size=16, embed_dim=32, depth=4, num_heads=2, img_size=64,
            out_indices=[0, 1, 2, 3],
        ),
        decode_head=dict(
            type="ReinMask2FormerHead",
            replace_query_feat=True,
            feat_channels=32,
            num_classes=19,
            num_queries=10,
            transformer_decoder=dict(num_layers=3),
            train_cfg=dict(num_points=256),
        ),
    ),
    test_cfg=dict(
        _delete_=True,
        mode="slide", crop_size=(64, 64), stride=(32, 32)),
    peft=dict(enabled=True, adapter_keywords=["reins"]),
)
