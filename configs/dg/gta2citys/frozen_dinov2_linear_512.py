"""BASELINE config #1: frozen DINOv2-L + LinearHead, single-scale 512x512
eval (CPU-runnable minimum end-to-end slice, SURVEY §7.2 stage 3)."""

config = dict(
    name="frozen_dinov2_linear_512",
    crop_size=(512, 512),
    num_classes=19,
    model=dict(
        type="EncoderDecoder",
        backbone=dict(
            type="DinoVisionTransformer",
            patch_size=16,
            embed_dim=1024,
            depth=24,
            num_heads=16,
            mlp_ratio=4,
            img_size=512,
            init_values=1e-05,
        ),
        decode_head=dict(
            type="LinearHead",
            in_channels=[1024] * 4,
            channels=256,
            dropout_ratio=0.1,
            num_classes=19,
            align_corners=False,
        ),
    ),
    test_cfg=dict(mode="whole", crop_size=(512, 512)),
    peft=dict(enabled=True, adapter_keywords=[]),  # backbone fully frozen
    compute=dict(dtype="bfloat16", attn_impl="auto"),
)
