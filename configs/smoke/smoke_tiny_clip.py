"""Smoke: tiny CLIP-style backbone (quickgelu + ln_pre) in MsVFM."""

config = dict(
    _base_=["smoke_tiny_ms_masked.py"],
    name="smoke_tiny_clip",
    model=dict(
        backbone=dict(
            _delete_=True,
            type="LoRABackbone",
            backbone=dict(
                type="CLIPVisionTransformer", patch_size=16, width=32,
                layers=4, heads=2, input_resolution=64,
                out_indices=[0, 1, 2, 3],
            ),
            checkpoint="",
            Lora_config=dict(r=4, lora_alpha=4, lora_dropout=0.1,
                             target_modules=["out_proj", "mlp.c_fc",
                                             "mlp.c_proj"]),
        ),
    ),
)
