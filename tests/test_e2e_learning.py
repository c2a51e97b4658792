"""End-to-end learning test: the full train step must actually LEARN a
separable synthetic task, not merely produce decreasing losses (SURVEY §4b's
'benchmark eval as the oracle' made cheap: a color-coded segmentation task a
working pipeline solves quickly and a subtly broken one does not)."""

import jax
import jax.numpy as jnp
import numpy as np

from test_models import build_tiny_msvfm

from vfmseg_tpu.eval.evaluator import make_predict_fn
from vfmseg_tpu.train import (
    TrainState,
    make_optimizer,
    make_train_step,
    partition_params,
    trainable_predicate,
)

K = jax.random.PRNGKey
NUM_CLASSES = 5


def _synthetic_batch(key, bs=4, hw=128):
    """Blocky class layout; image = class-coded color + noise."""
    kc, kn = jax.random.split(key)
    coarse = jax.random.randint(kc, (bs, hw // 16, hw // 16), 0, NUM_CLASSES)
    labels = jnp.repeat(jnp.repeat(coarse, 16, axis=1), 16, axis=2)
    palette = jnp.asarray(
        [[1.0, -1.0, 0.0], [-1.0, 1.0, 0.0], [0.0, 0.0, 1.5],
         [1.2, 1.2, -0.5], [-1.0, -1.0, -1.0]])
    img = palette[labels] + 0.3 * jax.random.normal(kn, (bs, hw, hw, 3))
    return img.astype(jnp.float32), labels.astype(jnp.int32)


def test_tiny_msvfm_learns_synthetic_segmentation_bf16():
    """The production training posture is bf16 activations (--amp default);
    the bf16 step must learn the same separable task (VERDICT r2 weak #7).
    Params/optimizer stay fp32 (flax dtype= is the computation dtype)."""
    model = build_tiny_msvfm(dtype=jnp.bfloat16)
    img0, lab0 = _synthetic_batch(K(0))
    variables = model.init(
        {"params": K(1), "crop": K(2), "mask": K(3), "dropout": K(4)},
        img0, lab0)
    trainable, frozen = partition_params(
        variables["params"], trainable_predicate(peft=False))
    optimizer = make_optimizer(trainable, base_lr=3e-3, max_steps=300,
                               warmup_steps=20)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(trainable))
    step_fn = make_train_step(model, optimizer, donate=False)

    first_loss = None
    for it in range(300):
        img, lab = _synthetic_batch(K(100 + it))
        state, metrics = step_fn(state, {"img": img, "label": lab}, K(7))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.6 * first_loss, (first_loss, last_loss)

    from vfmseg_tpu.train.optim import merge_params

    eval_vars = {"params": merge_params(state.trainable, state.frozen)}
    if state.batch_stats:
        eval_vars["batch_stats"] = state.batch_stats
    test_cfg = dict(mode="ms_slide_inference", threshold=0.968, conf=0.8,
                    lr_img_size=(64, 64), stride=(32, 32), crop_size=(64, 64))
    predict = make_predict_fn(model, test_cfg, out_hw=(128, 128))
    img, lab = _synthetic_batch(K(999), bs=2)
    pred = predict(eval_vars, img)
    acc = float(jnp.mean((pred == lab).astype(jnp.float32)))
    assert acc > 0.55, acc


def test_tiny_msvfm_learns_synthetic_segmentation():
    model = build_tiny_msvfm()
    img0, lab0 = _synthetic_batch(K(0))
    variables = model.init(
        {"params": K(1), "crop": K(2), "mask": K(3), "dropout": K(4)},
        img0, lab0)
    trainable, frozen = partition_params(
        variables["params"], trainable_predicate(peft=False))
    optimizer = make_optimizer(trainable, base_lr=3e-3, max_steps=300,
                               warmup_steps=20)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(trainable))
    step_fn = make_train_step(model, optimizer, donate=False)

    first_loss = None
    for it in range(300):
        img, lab = _synthetic_batch(K(100 + it))
        state, metrics = step_fn(state, {"img": img, "label": lab}, K(7))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert last_loss < 0.6 * first_loss, (first_loss, last_loss)

    # held-out accuracy through the REAL inference path (two-stage slide)
    from vfmseg_tpu.train.optim import merge_params

    eval_vars = {"params": merge_params(state.trainable, state.frozen)}
    if state.batch_stats:
        eval_vars["batch_stats"] = state.batch_stats
    test_cfg = dict(mode="ms_slide_inference", threshold=0.968, conf=0.8,
                    lr_img_size=(64, 64), stride=(32, 32), crop_size=(64, 64))
    predict = make_predict_fn(model, test_cfg, out_hw=(128, 128))
    img, lab = _synthetic_batch(K(999), bs=2)
    pred = predict(eval_vars, img)
    acc = float(jnp.mean((pred == lab).astype(jnp.float32)))
    # 5 classes -> chance is 0.2; a learning pipeline lands far above it
    assert acc > 0.55, acc
