"""Smoke: tiny SAM-style backbone (window attention + rel pos) in MsVFM."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_sam",
    model=dict(
        backbone=dict(
            _delete_=True,
            type="LoRABackbone",
            backbone=dict(
                type="SAMViT", img_size=64, embed_dim=32, depth=4,
                num_heads=2, window_size=2, global_attn_indexes=[1, 3],
                out_indices=[0, 1, 2, 3], use_rel_pos=True,
                pretrain_img_size=128,
            ),
            checkpoint="",
            Lora_config=dict(r=4, lora_alpha=4, lora_dropout=0.1,
                             target_modules=["qkv"]),
        ),
    ),
)
