"""Model base: LoRA-DINOv2-L + LinearHead (coarse) + VFMHead/MaskTransformer
(refine) under the MsVFM two-scale masked scheme.

Capability-parity with the reference headline model base
(configs/_base_/models/lora_dinov2_ms_masked.py), expressed in this
framework's config schema.
"""


def get_config():
    num_classes = 19
    embed_dim = 1024
    head_channels = 256
    return dict(
        crop_size=(1024, 1024),
        num_classes=num_classes,
        preprocessor=dict(
            mean=(123.675, 116.28, 103.53),
            std=(58.395, 57.12, 57.375),
            pad_val=0,
            seg_pad_val=255,
        ),
        model=dict(
            type="MsVFMEncoderDecoder",
            backbone=dict(
                type="LoRABackbone",
                backbone=dict(
                    type="DinoVisionTransformer",
                    patch_size=16,
                    embed_dim=embed_dim,
                    depth=24,
                    num_heads=16,
                    mlp_ratio=4,
                    img_size=512,
                    ffn_layer="mlp",
                    init_values=1e-05,
                    qkv_bias=True,
                    proj_bias=True,
                    ffn_bias=True,
                ),
                checkpoint="checkpoints/dinov2_converted.npz",
                Lora_config=dict(
                    r=32,
                    lora_alpha=32,
                    target_modules=["qkv"],
                    lora_dropout=0.1,
                ),
            ),
            decode_head=dict(
                type="LinearHead",
                in_channels=[embed_dim] * 4,
                channels=head_channels,
                dropout_ratio=0.1,
                num_classes=num_classes,
                align_corners=False,
            ),
            aux_head=dict(
                type="VFMHead",
                transformer=dict(
                    query_dim=head_channels,
                    n_heads=8,
                    d_head=64,
                    depth=3,
                    dropout=0.1,
                    mask_ratio=0.2,
                ),
                in_channels=[embed_dim] * 4,
                channels=head_channels,
                dropout_ratio=0.1,
                num_classes=num_classes,
                align_corners=False,
            ),
            detail_loss=1.0,
            scales=[1, 0.5],
            hr_crop_size=(512, 512),
            crop_coord_divisible=32,
            feature_scale=0.5,
        ),
        test_cfg=dict(
            mode="ms_slide_inference",
            threshold=0.968,       # reference "threadshod"
            conf=0.8,
            lr_img_size=(512, 1024),
            stride=(320, 320),
            crop_size=(512, 512),
        ),
    )
