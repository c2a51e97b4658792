"""Mesh / sharding tests on the 8-virtual-device CPU mesh (SURVEY §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vfmseg_tpu.eval.slide import ms_slide_inference
from vfmseg_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings

K = jax.random.PRNGKey

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_and_param_shardings():
    mesh = make_mesh(data=4, model=2)
    params = {
        "blocks_0": {"attn": {"qkv": {"kernel": jnp.zeros((32, 96)),
                                      "bias": jnp.zeros((96,))},
                              "proj": {"kernel": jnp.zeros((32, 32))}},
                     "mlp": {"fc1": {"kernel": jnp.zeros((32, 128))}}},
        "norm": {"scale": jnp.zeros((32,))},
    }
    sh = param_shardings(params, mesh)
    qkv = sh["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == P(None, "model")
    assert sh["norm"]["scale"].spec == P()


def test_sharded_ms_slide_matches_unsharded():
    mesh = make_mesh(data=8, model=1)

    wk = jax.random.normal(K(0), (3, 4))

    def lr_fn(x):
        return x @ wk

    def hr_fn(crops, ctx):
        return crops @ wk * 2.0 + ctx * 0.5

    img = jax.random.normal(K(1), (1, 64, 64, 3))
    kwargs = dict(crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
                  threshold=0.968, conf=0.8)
    base = ms_slide_inference(lr_fn, hr_fn, img, **kwargs)

    with jax.set_mesh(mesh):
        sharded = jax.jit(
            lambda im: ms_slide_inference(
                lr_fn, hr_fn, im,
                crop_sharding=NamedSharding(mesh, P("data")), **kwargs)
        )(jax.device_put(img, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_batch_sharding_train_style():
    mesh = make_mesh(data=8, model=1)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def mean_sq(x):
        return jnp.mean(x**2)

    np.testing.assert_allclose(float(mean_sq(xs)), float(mean_sq(x)), rtol=1e-6)


def test_evaluate_sharded_equals_unsharded_real_model():
    """User-surface check (VERDICT round-1 #6): make_predict_fn(mesh=...) on
    a real tiny MsVFM model must produce identical predictions to the
    unsharded path."""
    from test_models import build_tiny_msvfm

    from vfmseg_tpu.eval.evaluator import make_predict_fn

    model = build_tiny_msvfm()
    img = jax.random.normal(K(3), (1, 128, 128, 3))
    labels = jax.random.randint(K(4), (1, 128, 128), 0, 5)
    variables = model.init(
        {"params": K(5), "crop": K(6), "mask": K(7), "dropout": K(8)},
        img, labels)

    test_cfg = dict(mode="ms_slide_inference", threshold=0.968, conf=0.8,
                    lr_img_size=(64, 64), stride=(32, 32), crop_size=(64, 64))
    plain = make_predict_fn(model, test_cfg, out_hw=(128, 128))(
        variables, img)

    mesh = make_mesh(data=8, model=1)
    sharded = make_predict_fn(model, test_cfg, out_hw=(128, 128), mesh=mesh)(
        variables, img)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sharded))
