"""Smoke: DomainGeneral wrapping the tiny MsVFM model with
mode="ms_slide_inference" — the shape of the shipped
dg_lora_dinov2_ms_masked_consistency config (reference Wrapper.py delegates
predict to the inner model, rein/models/Wrapper.py:24-45)."""


def get_config():
    from vfmseg_tpu.core.config import load_config

    base = load_config("smoke_tiny_ms_masked")
    inner_model = base["model"].to_dict()
    cfg = base.to_dict()
    cfg["name"] = "smoke_tiny_dg_msvfm"
    cfg["model"] = dict(
        type="DomainGeneral",
        enable_mask_loss=True,
        color_jitter_strength=0.25,
        color_jitter_probability=0.2,
        blur=True,
        mask_ratio=0.7,
        mask_block_size=16,
        lamda_mask=0.5,
        model_cfg=inner_model,
    )
    return cfg
