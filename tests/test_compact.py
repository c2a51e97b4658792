"""Compact gated inference must match the dense path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.eval.compact import CompactMsSlide
from vfmseg_tpu.eval.slide import ms_slide_inference

K = jax.random.PRNGKey


def _fns():
    w_lr = jax.random.normal(K(0), (3, 4))

    def lr_fn(variables, x):
        del variables
        # mixed confidence: strongly confident in the top half
        logits = x @ w_lr
        bias = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) <
            logits.shape[1] // 2, 50.0, 0.0)
        return logits + bias * jax.nn.one_hot(2, 4)

    def hr_fn(variables, crops, ctx):
        del variables
        return crops @ w_lr * 2.0 + ctx * 0.1

    return lr_fn, hr_fn


def test_compact_matches_dense():
    lr_fn, hr_fn = _fns()
    img = jax.random.normal(K(1), (1, 64, 64, 3))

    dense = ms_slide_inference(
        lambda x: lr_fn(None, x), lambda c, t: hr_fn(None, c, t), img,
        crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
        threshold=0.968, conf=0.8)

    compact = CompactMsSlide(
        lr_fn, hr_fn, crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
        threshold=0.968, conf=0.8)
    out, n_refined = compact(None, img)
    assert 0 < n_refined < 9  # the gate actually skipped something
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_stream_matches_dense_per_image():
    """stream() (grouped stage-1 + pipelined gate) must give the same
    per-image logits as the dense path."""
    lr_fn, hr_fn = _fns()
    images = [jax.random.normal(K(10 + i), (64, 64, 3)) for i in range(5)]

    compact = CompactMsSlide(
        lr_fn, hr_fn, crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
        threshold=0.968, conf=0.8)
    outs = list(compact.stream(None, images, group=2, depth=2))
    assert len(outs) == 5
    for im, out in zip(images, outs):
        dense = ms_slide_inference(
            lambda x: lr_fn(None, x), lambda c, t: hr_fn(None, c, t),
            im[None], crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
            threshold=0.968, conf=0.8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense[0]),
                                   rtol=1e-5, atol=1e-5)


def test_bucket_overflow_still_refines_everything():
    """More needed windows than the largest bucket must NOT silently drop
    refinements (the identical-to-dense contract)."""
    lr_fn, hr_fn = _fns()
    img = jax.random.normal(K(4), (2, 64, 64, 3))  # 18 windows total

    dense = ms_slide_inference(
        lambda x: lr_fn(None, x), lambda c, t: hr_fn(None, c, t), img,
        crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
        threshold=0.968, conf=0.8)
    compact = CompactMsSlide(
        lr_fn, hr_fn, crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
        threshold=0.968, conf=0.8, buckets=(0, 2))  # force overflow
    out, n_refined = compact(None, img)
    assert n_refined > 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_gate_stat_counters():
    """The measured-rate counters must tally every window seen/refined
    (bench.py derives its FLOPs/MFU report from them)."""
    lr_fn, hr_fn = _fns()
    img = jax.random.normal(K(1), (2, 64, 64, 3))
    compact = CompactMsSlide(
        lr_fn, hr_fn, crop=(32, 32), stride=(16, 16), lr_size=(32, 32),
        threshold=0.968, conf=0.8)
    _out, n_refined = compact(None, img)
    assert compact.stat_windows == 2 * 9  # 3x3 grid per image
    assert compact.stat_refined == n_refined > 0
    compact.reset_stats()
    assert compact.stat_windows == 0 and compact.stat_refined == 0
    list(compact.stream(None, [img[0], img[1]], group=2))
    assert compact.stat_windows == 2 * 9
    assert compact.stat_refined == n_refined


def test_compact_all_confident_refines_nothing():
    def lr_fn(variables, x):
        return jnp.zeros(x.shape[:3] + (4,)).at[..., 1].set(100.0)

    def hr_fn(variables, crops, ctx):
        raise AssertionError("refinement must not be traced")

    compact = CompactMsSlide(lr_fn, hr_fn, crop=(32, 32), stride=(16, 16),
                             lr_size=(32, 32))
    out, n = compact(None, jax.random.normal(K(2), (1, 64, 64, 3)))
    assert n == 0
    assert out.shape == (1, 64, 64, 4)


def test_stream_evaluate_matches_predict_fn():
    """The CLI's gated stream path must produce the same predictions as the
    per-image compact predictor (tools/test.py use_stream branch)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_models import build_tiny_msvfm

    from vfmseg_tpu.eval.evaluator import make_predict_fn, stream_evaluate

    model = build_tiny_msvfm()
    img0 = jax.random.normal(K(0), (1, 128, 128, 3))
    lab0 = jax.random.randint(K(1), (1, 128, 128), 0, 5)
    variables = model.init(
        {"params": K(2), "crop": K(3), "mask": K(4), "dropout": K(5)},
        img0, lab0)
    test_cfg = dict(mode="ms_slide_inference", gate="compact",
                    threshold=0.968, conf=0.8, lr_img_size=(64, 64),
                    stride=(32, 32), crop_size=(64, 64))
    images = [jax.random.normal(K(10 + i), (128, 128, 3)) for i in range(5)]

    predict = make_predict_fn(model, test_cfg, out_hw=(128, 128))
    expected = [np.asarray(predict(variables, im[None])[0]) for im in images]

    got = [np.asarray(p) for p in stream_evaluate(
        model, variables, test_cfg, images, out_hw=(128, 128), group=2)]
    assert len(got) == 5
    for a, b in zip(got, expected):
        np.testing.assert_array_equal(a, b)


def test_stream_fused_dispatch_matches_plain(monkeypatch):
    """VFMSEG_STREAM_FUSE=1 (finish+next-stage1 in one jit dispatch) must
    yield exactly the plain stream's outputs, including a non-full tail
    group and the gate counters."""
    import os as _os
    import sys
    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from test_models import build_tiny_msvfm

    from vfmseg_tpu.eval.evaluator import make_compact_ms_slide

    model = build_tiny_msvfm()
    img0 = jax.random.normal(K(0), (1, 128, 128, 3))
    lab0 = jax.random.randint(K(1), (1, 128, 128), 0, 5)
    variables = model.init(
        {"params": K(2), "crop": K(3), "mask": K(4), "dropout": K(5)},
        img0, lab0)
    test_cfg = dict(mode="ms_slide_inference", gate="compact",
                    threshold=0.968, conf=0.8, lr_img_size=(64, 64),
                    stride=(32, 32), crop_size=(64, 64))
    images = [jax.random.normal(K(30 + i), (128, 128, 3)) for i in range(7)]

    engine, _ = make_compact_ms_slide(model, test_cfg)
    plain = [np.asarray(o) for o in
             engine.stream(variables, images, group=2, depth=2)]
    stats_plain = (engine.stat_windows, engine.stat_refined)

    monkeypatch.setenv("VFMSEG_STREAM_FUSE", "1")
    engine2, _ = make_compact_ms_slide(model, test_cfg)
    fused = [np.asarray(o) for o in
             engine2.stream(variables, images, group=2, depth=2)]
    assert (engine2.stat_windows, engine2.stat_refined) == stats_plain
    assert len(fused) == len(plain) == 7
    for a, b in zip(fused, plain):
        np.testing.assert_allclose(a, b, atol=1e-5)
