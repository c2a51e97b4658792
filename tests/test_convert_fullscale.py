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


def _check(converted, config_name, allowed_missing=("lora",)):
    cfg = load_config(config_name)
    model = build_segmentor(cfg.model.to_dict(), dtype=jnp.bfloat16,
                            attn_impl="xla")
    ch = tuple(cfg.get("crop_size", (1024, 1024)))
    img = jnp.zeros((1,) + ch + (3,), jnp.bfloat16)
    labels = jnp.zeros((1,) + ch, jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "crop": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            img, labels))
    expect = {"/".join(k): v.shape
              for k, v in flatten_dict(shapes["params"]["backbone"]).items()}
    got = {"/".join(k): np.asarray(v).shape
           for k, v in flatten_dict(converted).items()}
    for path, shape in got.items():
        assert path in expect, f"converted param {path} unknown to the model"
        assert tuple(shape) == tuple(expect[path]), (
            f"{path}: converted {shape} vs model {expect[path]}")
    missing = set(expect) - set(got)
    bad = [p for p in missing
           if not any(tag in p for tag in allowed_missing)]
    assert not bad, f"model params not covered by the converter: {bad[:8]}"


def test_converted_eva02_matches_backbone_init():
    e, depth, hidden = 1024, 24, int(1024 * 4 * 2 / 3)
    grid = 512 // 16
    sd = {
        "cls_token": np.zeros((1, 1, e), np.float32),
        "pos_embed": np.zeros((1, 1 + grid * grid, e), np.float32),
        "patch_embed.proj.weight": np.zeros((e, 3, 16, 16), np.float32),
        "patch_embed.proj.bias": np.zeros((e,), np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{b}.{n}.weight"] = np.zeros((e,), np.float32)
            sd[f"{b}.{n}.bias"] = np.zeros((e,), np.float32)
        for p in ("q_proj", "k_proj", "v_proj"):
            sd[f"{b}.attn.{p}.weight"] = np.zeros((e, e), np.float32)
        sd[f"{b}.attn.q_bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.attn.v_bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.attn.proj.weight"] = np.zeros((e, e), np.float32)
        sd[f"{b}.attn.proj.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.mlp.w1.weight"] = np.zeros((hidden, e), np.float32)
        sd[f"{b}.mlp.w1.bias"] = np.zeros((hidden,), np.float32)
        sd[f"{b}.mlp.w2.weight"] = np.zeros((hidden, e), np.float32)
        sd[f"{b}.mlp.w2.bias"] = np.zeros((hidden,), np.float32)
        sd[f"{b}.mlp.w3.weight"] = np.zeros((e, hidden), np.float32)
        sd[f"{b}.mlp.w3.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.mlp.ffn_ln.weight"] = np.zeros((hidden,), np.float32)
        sd[f"{b}.mlp.ffn_ln.bias"] = np.zeros((hidden,), np.float32)
    from tools.convert_eva2 import convert_eva02_state_dict

    _check(convert_eva02_state_dict(sd), "lora_eva02_ms_masked")


def test_converted_clip_matches_backbone_init():
    e, depth = 1024, 24
    grid14 = 224 // 14
    sd = {
        "visual.class_embedding": np.zeros((e,), np.float32),
        "visual.positional_embedding": np.zeros((1 + grid14 * grid14, e),
                                                np.float32),
        "visual.conv1.weight": np.zeros((e, 3, 14, 14), np.float32),
        "visual.ln_pre.weight": np.zeros((e,), np.float32),
        "visual.ln_pre.bias": np.zeros((e,), np.float32),
    }
    for i in range(depth):
        b = f"visual.transformer.resblocks.{i}"
        for n in ("ln_1", "ln_2"):
            sd[f"{b}.{n}.weight"] = np.zeros((e,), np.float32)
            sd[f"{b}.{n}.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.attn.in_proj_weight"] = np.zeros((3 * e, e), np.float32)
        sd[f"{b}.attn.in_proj_bias"] = np.zeros((3 * e,), np.float32)
        sd[f"{b}.attn.out_proj.weight"] = np.zeros((e, e), np.float32)
        sd[f"{b}.attn.out_proj.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.mlp.c_fc.weight"] = np.zeros((4 * e, e), np.float32)
        sd[f"{b}.mlp.c_fc.bias"] = np.zeros((4 * e,), np.float32)
        sd[f"{b}.mlp.c_proj.weight"] = np.zeros((e, 4 * e), np.float32)
        sd[f"{b}.mlp.c_proj.bias"] = np.zeros((e,), np.float32)
    from tools.convert_clip import convert_clip_state_dict

    _check(convert_clip_state_dict(sd), "lora_clip_ms_masked")


def test_converted_sam_matches_backbone_init():
    e, depth, hd = 1280, 32, 80
    grid = 1024 // 16
    glob = {7, 15, 23, 31}
    sd = {
        "pos_embed": np.zeros((1, grid, grid, e), np.float32),
        "patch_embed.proj.weight": np.zeros((e, 3, 16, 16), np.float32),
        "patch_embed.proj.bias": np.zeros((e,), np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{b}.{n}.weight"] = np.zeros((e,), np.float32)
            sd[f"{b}.{n}.bias"] = np.zeros((e,), np.float32)
        sd[f"{b}.attn.qkv.weight"] = np.zeros((3 * e, e), np.float32)
        sd[f"{b}.attn.qkv.bias"] = np.zeros((3 * e,), np.float32)
        sd[f"{b}.attn.proj.weight"] = np.zeros((e, e), np.float32)
        sd[f"{b}.attn.proj.bias"] = np.zeros((e,), np.float32)
        rel = (2 * grid - 1) if i in glob else (2 * 14 - 1)
        sd[f"{b}.attn.rel_pos_h"] = np.zeros((rel, hd), np.float32)
        sd[f"{b}.attn.rel_pos_w"] = np.zeros((rel, hd), np.float32)
        sd[f"{b}.mlp.lin1.weight"] = np.zeros((4 * e, e), np.float32)
        sd[f"{b}.mlp.lin1.bias"] = np.zeros((4 * e,), np.float32)
        sd[f"{b}.mlp.lin2.weight"] = np.zeros((e, 4 * e), np.float32)
        sd[f"{b}.mlp.lin2.bias"] = np.zeros((e,), np.float32)
    from tools.convert_sam import convert_sam_state_dict

    _check(convert_sam_state_dict(sd), "lora_sam_ms_masked")
