"""eval_shape-level tensor-parallel sharding check of the FULL-SIZE flagship
presets on the 4x2 virtual mesh (VERDICT r2 weak #3): the TP rules must
match the hot ViT-L weights AND divide evenly at real dims — including the
SwiGLU-hidden rounding and Mask2Former's 8-head decoders."""

import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from vfmseg_tpu.core.config import load_config
from vfmseg_tpu.models.build import build_segmentor
from vfmseg_tpu.parallel.mesh import make_mesh, param_shardings

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _param_shapes(config_name):
    cfg = load_config(config_name)
    model = build_segmentor(cfg.model.to_dict(), dtype=jnp.bfloat16,
                            attn_impl="xla")
    hw = tuple(cfg.get("crop_size", (1024, 1024)))
    img = jnp.zeros((1,) + hw + (3,), jnp.bfloat16)
    labels = jnp.zeros((1,) + hw, jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "crop": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            img, labels))
    return shapes["params"]


@pytest.mark.parametrize("config_name,min_tp_leaves", [
    ("dg_lora_dinov2_ms_masked", 24 * 4),     # qkv/proj/fc1/fc2 x 24 blocks
    ("dg_rein_dinov2_mask2former", 24 * 4),
])
def test_flagship_tp_rules_divide_at_full_scale(config_name, min_tp_leaves):
    params = _param_shapes(config_name)
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh)

    flat_p = flatten_dict(params)
    flat_s = flatten_dict(shardings)
    n_tp = 0
    for key, sh in flat_s.items():
        spec = sh.spec
        if "model" in spec:
            axis = list(spec).index("model")
            shape = flat_p[key].shape
            assert shape[axis] % 2 == 0, ("/".join(key), shape, spec)
            n_tp += 1
    # the hot ViT-L weights (the FLOPs) must actually be TP-sharded; a
    # silently-unmatched rule set would replicate everything and "pass"
    assert n_tp >= min_tp_leaves, n_tp

    # the qkv kernels specifically: [1024, 3072] split on the head axis
    qkv = [k for k in flat_s if k[-2:] == ("qkv", "kernel")]
    assert len(qkv) >= 24
    for k in qkv:
        assert "model" in flat_s[k].spec, "/".join(k)


def test_eva02_swiglu_hidden_tp_divides_at_full_scale():
    """EVA02-L SwiGLU hidden dims at real size: whatever the rounding, every
    model-axis-sharded leaf must divide by the TP size."""
    params = _param_shapes("dg_lora_eva02_ms_masked")
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh)
    flat_p, flat_s = flatten_dict(params), flatten_dict(shardings)
    n_tp = 0
    for key, sh in flat_s.items():
        if "model" in sh.spec:
            axis = list(sh.spec).index("model")
            assert flat_p[key].shape[axis] % 2 == 0, "/".join(key)
            n_tp += 1
    assert n_tp >= 24 * 2  # at least the per-block attention + ffn kernels
