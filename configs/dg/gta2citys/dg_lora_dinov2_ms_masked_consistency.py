"""Headline model wrapped in the DomainGeneral trainer with the
masked-image consistency branch enabled (reference DG.py mask_loss; the
reference ships it disabled, DG.py:104 — this config turns it on)."""


def get_config():
    from vfmseg_tpu.core.config import load_config

    base = load_config("dg_lora_dinov2_ms_masked")
    inner_model = base["model"].to_dict()
    cfg = base.to_dict()
    cfg["name"] = "dg_lora_dinov2_ms_masked_consistency"
    cfg["model"] = dict(
        type="DomainGeneral",
        enable_mask_loss=True,
        color_jitter_strength=0.25,
        color_jitter_probability=0.2,
        blur=True,
        mask_ratio=0.7,
        mask_block_size=64,
        lamda_mask=0.5,
        model_cfg=inner_model,
    )
    return cfg
