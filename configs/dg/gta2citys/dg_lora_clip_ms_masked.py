"""DG GTAV->Cityscapes with LoRA CLIP ViT-L under the MsVFM scheme
(reference configs/_base_/models/lora_clip_ms_masked.py)."""

config = dict(
    _base_=["dg_lora_dinov2_ms_masked.py"],
    name="dg_lora_clip_ms_masked",
    model=dict(
        backbone=dict(
            _delete_=True,
            type="LoRABackbone",
            backbone=dict(
                type="CLIPVisionTransformer",
                patch_size=16,
                width=1024,
                layers=24,
                heads=16,
                input_resolution=512,
                drop_path_rate=0.1,
                out_indices=[7, 11, 15, 23],
                get_embeddings=False,
                output_dim=512,
            ),
            checkpoint="checkpoints/clip_converted.npz",
            Lora_config=dict(
                r=32,
                lora_alpha=32,
                target_modules=["out_proj", "mlp.c_fc", "mlp.c_proj"],
                lora_dropout=0.1,
            ),
        ),
    ),
)
