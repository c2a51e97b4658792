"""Full-scale converter shape check: a synthetic DINOv2 ViT-L/14 torch
state dict must convert into a tree whose STRUCTURE AND SHAPES exactly match
the headline config's backbone init — the guard for the user's first step
(loading real weights via --backbone-init / --backbone). Shape-only
(jax.eval_shape), so it runs in seconds despite ViT-L size."""

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict

from tools.convert_dinov2 import convert_dinov2_state_dict
from vfmseg_tpu.core.config import load_config
from vfmseg_tpu.models.build import build_segmentor


def _synthetic_vitl14_state_dict():
    """DINOv2 ViT-L/14 layout: patch 14, img 518, embed 1024, depth 24."""
    e, depth, patch, grid = 1024, 24, 14, 518 // 14
    sd = {
        "cls_token": np.zeros((1, 1, e), np.float32),
        "mask_token": np.zeros((1, e), np.float32),
        "pos_embed": np.zeros((1, 1 + grid * grid, e), np.float32),
        "patch_embed.proj.weight": np.zeros((e, 3, patch, patch), np.float32),
        "patch_embed.proj.bias": np.zeros((e,), np.float32),
        "norm.weight": np.zeros((e,), np.float32),
        "norm.bias": np.zeros((e,), np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.zeros((e,), np.float32)
        sd[f"{b}.norm1.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.attn.qkv.weight"] = np.zeros((3 * e, e), np.float32)
        sd[f"{b}.attn.qkv.bias"] = np.zeros((3 * e,), np.float32)
        sd[f"{b}.attn.proj.weight"] = np.zeros((e, e), np.float32)
        sd[f"{b}.attn.proj.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.ls1.gamma"] = np.zeros((e,), np.float32)
        sd[f"{b}.norm2.weight"] = np.zeros((e,), np.float32)
        sd[f"{b}.norm2.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.mlp.fc1.weight"] = np.zeros((4 * e, e), np.float32)
        sd[f"{b}.mlp.fc1.bias"] = np.zeros((4 * e,), np.float32)
        sd[f"{b}.mlp.fc2.weight"] = np.zeros((e, 4 * e), np.float32)
        sd[f"{b}.mlp.fc2.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.ls2.gamma"] = np.zeros((e,), np.float32)
    return sd


def test_converted_vitl_matches_headline_backbone_init():
    converted = convert_dinov2_state_dict(_synthetic_vitl14_state_dict(),
                                          target_patch=16, target_img=512)

    cfg = load_config("dg_lora_dinov2_ms_masked")
    model = build_segmentor(cfg.model.to_dict(), dtype=jnp.bfloat16,
                            attn_impl="xla")
    img = jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16)
    labels = jnp.zeros((1, 1024, 1024), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "crop": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            img, labels))

    expect = {
        "/".join(k): v.shape
        for k, v in flatten_dict(shapes["params"]["backbone"]).items()
    }
    got = {"/".join(k): np.asarray(v).shape
           for k, v in flatten_dict(converted).items()}

    # every converted leaf must land on an init leaf with the same shape
    for path, shape in got.items():
        assert path in expect, f"converted param {path} unknown to the model"
        assert tuple(shape) == tuple(expect[path]), (
            f"{path}: converted {shape} vs model {expect[path]}")

    # everything the model expects that is NOT covered must be an adapter
    # (LoRA params live in the random-init trainable partition, not the
    # converted checkpoint)
    missing = set(expect) - set(got)
    assert missing, "LoRA adapter params should not come from the converter"
    assert all("lora" in p for p in missing), sorted(missing)[:5]
