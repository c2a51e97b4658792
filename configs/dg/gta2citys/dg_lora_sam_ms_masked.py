"""DG GTAV->Cityscapes with LoRA SAM ViT-H under the MsVFM scheme (reference
configs/_base_/models/lora_sam_ms_masked.py). SAM emits 1280-ch features."""

config = dict(
    _base_=["dg_lora_dinov2_ms_masked.py"],
    name="dg_lora_sam_ms_masked",
    model=dict(
        backbone=dict(
            _delete_=True,
            type="LoRABackbone",
            backbone=dict(
                type="SAMViT",
                img_size=512,
                embed_dim=1280,
                depth=32,
                num_heads=16,
                window_size=14,
                global_attn_indexes=[7, 15, 23, 31],
                out_indices=[7, 15, 23, 31],
                use_rel_pos=True,
            ),
            checkpoint="checkpoints/sam_converted.npz",
            Lora_config=dict(
                r=32,
                lora_alpha=32,
                target_modules=["qkv"],
                lora_dropout=0.1,
            ),
        ),
        decode_head=dict(
            in_channels=[1280, 1280, 1280, 1280],
            channels=320,
        ),
        aux_head=dict(
            in_channels=[1280, 1280, 1280, 1280],
        ),
    ),
)
