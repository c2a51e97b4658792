"""Smoke: tiny EVA02-style backbone (rope + subln + swiglu) in MsVFM."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_eva02",
    model=dict(
        backbone=dict(
            _delete_=True,
            type="LoRABackbone",
            backbone=dict(
                type="EVA2", patch_size=16, embed_dim=32, depth=4,
                num_heads=2, img_size=64, out_indices=[0, 1, 2, 3],
                pt_hw_seq_len=4,
            ),
            checkpoint="",
            Lora_config=dict(r=4, lora_alpha=4, lora_dropout=0.1,
                             target_modules=["q_proj", "k_proj", "v_proj",
                                             "attn.proj"]),
        ),
    ),
)
