"""Config-system tests: loading, _base_ inheritance, builds, overrides."""

import jax
import jax.numpy as jnp
import pytest

from vfmseg_tpu.core.config import Config, deep_merge, load_config, parse_value
from vfmseg_tpu.models.build import build_segmentor


class TestConfigSystem:
    def test_deep_merge_and_delete(self):
        base = Config({"a": {"x": 1, "y": 2}, "b": 3})
        over = {"a": {"y": 5}, "c": 7}
        merged = deep_merge(base, over)
        assert merged.a.x == 1 and merged.a.y == 5 and merged.c == 7
        wiped = deep_merge(base, {"a": {"_delete_": True, "z": 9}})
        assert "x" not in wiped.a and wiped.a.z == 9

    def test_parse_value(self):
        assert parse_value("3e-4") == 3e-4
        assert parse_value("[1, 2]") == [1, 2]
        assert parse_value("true-ish-string") == "true-ish-string"

    def test_load_headline_config_with_override(self):
        cfg = load_config("dg_lora_dinov2_ms_masked",
                          overrides=["optimizer.lr=3e-4"])
        assert cfg.optimizer.lr == 3e-4
        assert cfg.model.type == "MsVFMEncoderDecoder"
        assert cfg.model.backbone.Lora_config.r == 32
        assert cfg.test_cfg.threshold == 0.968

    def test_base_inheritance_backbone_swap(self):
        cfg = load_config("dg_lora_eva02_ms_masked")
        assert cfg.model.backbone.backbone.type == "EVA2"
        # inherited pieces survive
        assert cfg.model.aux_head.transformer.mask_ratio == 0.2
        assert cfg.schedule.max_iters == 40000


@pytest.mark.parametrize("name,backbone_type", [
    ("dg_lora_dinov2_ms_masked", "DinoVisionTransformer"),
    ("dg_lora_eva02_ms_masked", "EVA2"),
    ("dg_lora_clip_ms_masked", "CLIPVisionTransformer"),
    ("dg_lora_sam_ms_masked", "SAMViT"),
])
def test_all_lora_configs_build_and_trace(name, backbone_type):
    """Every LoRA backbone-family config must build and trace its full
    training graph (shape-only: no FLOPs spent on ViT-L/H)."""
    cfg = load_config(name)
    assert cfg.model.backbone.backbone.type == backbone_type
    model = build_segmentor(cfg.model, dtype=jnp.bfloat16, attn_impl="xla")
    img = jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16)
    labels = jnp.zeros((1, 1024, 1024), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "crop": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            img, labels))
    leaves = jax.tree_util.tree_leaves(shapes["params"])
    n_params = sum(int(jnp.prod(jnp.array(s.shape))) for s in leaves)
    assert n_params > 100_000_000  # ViT-L/H scale
    # LoRA leaves present
    from flax.traverse_util import flatten_dict

    paths = {"/".join(k) for k in flatten_dict(shapes["params"])}
    assert any("lora_a" in p for p in paths)
