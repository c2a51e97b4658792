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


def test_compact_stream_sharded_equals_unsharded_real_model():
    """VERDICT r2 #3: the gated stream engine sharded over the data axis
    must yield the exact predictions of the unsharded engine (including a
    tail group that does not divide the axis)."""
    from test_models import build_tiny_msvfm

    from vfmseg_tpu.eval.evaluator import make_compact_ms_slide

    model = build_tiny_msvfm()
    imgs = [jax.random.normal(K(10 + i), (128, 128, 3)) for i in range(5)]
    init_img = imgs[0][None]
    labels = jax.random.randint(K(4), (1, 128, 128), 0, 5)
    variables = model.init(
        {"params": K(5), "crop": K(6), "mask": K(7), "dropout": K(8)},
        init_img, labels)

    test_cfg = dict(mode="ms_slide_inference", gate="compact",
                    threshold=0.5, conf=0.8,
                    lr_img_size=(64, 64), stride=(32, 32), crop_size=(64, 64))
    plain_engine, _ = make_compact_ms_slide(model, test_cfg)
    plain = [np.asarray(x) for x in
             plain_engine.stream(variables, imgs, group=4, depth=1)]

    mesh = make_mesh(data=8, model=1)
    sh_engine, _ = make_compact_ms_slide(model, test_cfg, mesh=mesh)
    with jax.set_mesh(mesh):
        sharded = [np.asarray(x) for x in
                   sh_engine.stream(variables, imgs, group=4, depth=1)]

    assert len(plain) == len(sharded) == 5
    # identical gate decisions (the gate reads the same confidences)
    assert plain_engine.stat_refined == sh_engine.stat_refined
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_dp_tp_train_step_matches_single_device():
    """One sharded (data=4, model=2) train step must produce the same loss
    and updated params as the unsharded step — the correctness guarantee
    behind dryrun_multichip's mesh composition."""
    import jax.numpy as jnp

    from test_models import build_tiny_msvfm

    from vfmseg_tpu.parallel.mesh import param_shardings
    from vfmseg_tpu.train import (
        TrainState, make_optimizer, make_train_step, partition_params,
        trainable_predicate)

    model = build_tiny_msvfm()
    img = jax.random.normal(K(0), (4, 128, 128, 3))
    labels = jax.random.randint(K(1), (4, 128, 128), 0, 5)
    variables = model.init(
        {"params": K(2), "crop": K(3), "mask": K(4), "dropout": K(5)},
        img, labels)
    trainable, frozen = partition_params(variables["params"],
                                         trainable_predicate())
    optimizer = make_optimizer(trainable, base_lr=1e-3, max_steps=10)

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=jax.tree_util.tree_map(jnp.array, trainable),
            frozen=frozen,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(trainable))

    step_fn = make_train_step(model, optimizer, donate=False)
    batch = {"img": img, "label": labels}

    base_state, base_metrics = step_fn(fresh_state(), batch, K(9))

    mesh = make_mesh(data=4, model=2)
    state = fresh_state()
    t_shard = param_shardings(state.trainable, mesh)
    f_shard = param_shardings(state.frozen, mesh)
    state = state.replace(
        trainable=jax.tree_util.tree_map(jax.device_put, state.trainable,
                                         t_shard),
        frozen=jax.tree_util.tree_map(jax.device_put, state.frozen, f_shard))
    data_sh = NamedSharding(mesh, P("data"))
    sharded_batch = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
    with jax.set_mesh(mesh):
        sh_state, sh_metrics = step_fn(state, sharded_batch, K(9))

    # loss and grad_norm must agree to reduction-order tolerance. Updated
    # params are NOT compared elementwise: Adam's first step is ±lr *
    # sign(g), so fp reduction-order noise on near-zero grads legitimately
    # flips individual update signs.
    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(base_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(sh_metrics["grad_norm"]),
                               float(base_metrics["grad_norm"]), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(base_state.trainable),
                    jax.tree_util.tree_leaves(sh_state.trainable)):
        # updates are bounded by ~lr; shapes/dtypes and magnitude must match
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
