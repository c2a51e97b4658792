"""Orchestration parity: the batched two-stage engine must equal an
independent reimplementation of the reference's per-crop gate loop
(Ms_VFM_encoder_decoder.py:400-466 — stage-1 upsample, h/w grid, per-crop
confidence gate, F.pad accumulate / count_mat divide). Module-level parity
is covered by the torch goldens; this guards the COMPOSITION."""

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.eval.slide import ms_slide_inference
from vfmseg_tpu.ops.resize import resize

K = jax.random.PRNGKey


def reference_style_ms_inference(lr_fn, hr_fn, img, *, crop, stride, lr_size,
                                 threshold, conf):
    """Direct transcription of the reference's python loop semantics,
    written independently of eval/slide.py."""
    b, h, w, _ = img.shape
    ch, cw = crop
    sh, sw = stride
    stage1 = lr_fn(resize(img, size=lr_size, method="bilinear"))
    full = resize(stage1, size=(h, w), method="bilinear")
    c = full.shape[-1]

    h_grids = max(h - ch + sh - 1, 0) // sh + 1
    w_grids = max(w - cw + sw - 1, 0) // sw + 1
    preds = np.zeros((b, h, w, c), np.float32)
    count = np.zeros((b, h, w, 1), np.float32)
    for hi in range(h_grids):
        for wi in range(w_grids):
            y2 = min(hi * sh + ch, h)
            x2 = min(wi * sw + cw, w)
            y1 = max(y2 - ch, 0)
            x1 = max(x2 - cw, 0)
            ctx = full[:, y1:y2, x1:x2]
            probs = jax.nn.softmax(ctx.astype(jnp.float32), axis=-1)
            confidence = float(jnp.mean(
                (jnp.max(probs, axis=-1) > threshold).astype(jnp.float32)))
            if confidence < conf:
                crop_logit = hr_fn(img[:, y1:y2, x1:x2], ctx)
            else:
                crop_logit = ctx
            preds[:, y1:y2, x1:x2] += np.asarray(crop_logit, np.float32)
            count[:, y1:y2, x1:x2] += 1.0
    assert (count == 0).sum() == 0
    return preds / count


def _fns():
    wk = jax.random.normal(K(0), (3, 4))

    def lr_fn(x):
        logits = x @ wk
        # make the top half of the image strongly confident so the gate
        # exercises BOTH branches
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        boost = jnp.where(rows < logits.shape[1] // 2, 40.0, 0.0)
        return logits + boost * jax.nn.one_hot(1, 4)

    def hr_fn(crops, ctx):
        return crops @ wk * 3.0 + ctx * 0.25

    return lr_fn, hr_fn


def test_batched_engine_matches_reference_loop():
    lr_fn, hr_fn = _fns()
    img = jax.random.normal(K(1), (2, 96, 96, 3))
    kwargs = dict(crop=(32, 32), stride=(16, 16), lr_size=(48, 48),
                  threshold=0.968, conf=0.8)

    ours = ms_slide_inference(lr_fn, hr_fn, img, **kwargs)
    ref = reference_style_ms_inference(lr_fn, hr_fn, img, **kwargs)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_batched_engine_matches_reference_loop_nondivisible():
    """Image size not a multiple of the stride: edge windows clamp to the
    border (reference's min/max box arithmetic)."""
    lr_fn, hr_fn = _fns()
    img = jax.random.normal(K(2), (1, 70, 90, 3))
    kwargs = dict(crop=(32, 32), stride=(24, 24), lr_size=(32, 48),
                  threshold=0.968, conf=0.8)
    ours = ms_slide_inference(lr_fn, hr_fn, img, **kwargs)
    ref = reference_style_ms_inference(lr_fn, hr_fn, img, **kwargs)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)
