"""Compact (gated) two-stage inference: only refine low-confidence crops.

The dense path (eval/slide.ms_slide_inference) refines every window and
selects afterwards — simple, fully jitted, but it pays for windows the gate
discards. With a trained model most windows pass the confidence gate
(reference threshold 0.968 / conf 0.8, Ms_VFM_encoder_decoder.py:446-452),
so production eval can skip their ViT forwards entirely.

Host-orchestrated two-phase design (SURVEY §5.7 "two-pass gather"):
  phase 1 (jit): stage-1 whole pass + per-window confidences (tiny readback)
  phase 2 (jit): gather the windows needing refinement, pad the batch to a
    bucket size (bounded retraces: one compiled graph per bucket), refine,
    scatter-add together with the reused contexts.
Outputs are identical to the dense path (the same select semantics).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.eval.slide import accumulate_crops, compute_slide_grid, extract_crops
from vfmseg_tpu.ops.resize import resize

DEFAULT_BUCKETS = (0, 1, 2, 4, 8, 12, 18, 24, 32, 48, 64)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class CompactMsSlide:
    """Reusable gated two-stage predictor for one (model, test_cfg)."""

    def __init__(self, lr_logits_fn: Callable, hr_logits_fn: Callable, *,
                 crop: Tuple[int, int] = (512, 512),
                 stride: Tuple[int, int] = (320, 320),
                 lr_size: Tuple[int, int] = (512, 1024),
                 threshold: float = 0.968, conf: float = 0.8,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 align_corners: bool = False):
        self.lr_fn = lr_logits_fn
        self.hr_fn = hr_logits_fn
        self.crop = crop
        self.stride = stride
        self.lr_size = lr_size
        self.threshold = threshold
        self.conf = conf
        self.buckets = buckets
        self.align_corners = align_corners
        self._stage1 = jax.jit(self._stage1_impl, static_argnums=(2,))
        self._refine: Dict[int, Callable] = {}

    def _stage1_impl(self, variables, img, img_hw):
        full = self.lr_fn(
            variables,
            resize(img, size=self.lr_size, method="bilinear",
                   align_corners=self.align_corners))
        full = resize(full, size=img_hw, method="bilinear",
                      align_corners=self.align_corners)
        boxes = compute_slide_grid(img_hw, self.crop, self.stride)
        ctx = extract_crops(full, boxes, self.crop)
        probs = jax.nn.softmax(ctx.astype(jnp.float32), axis=-1)
        confidence = jnp.mean(
            (jnp.max(probs, axis=-1) > self.threshold).astype(jnp.float32),
            axis=(1, 2))
        return full, ctx, confidence

    def _refine_fn(self, k: int) -> Callable:
        if k not in self._refine:
            def fn(variables, crops, ctxs):
                return self.hr_fn(variables, crops, ctxs)

            self._refine[k] = jax.jit(fn)
        return self._refine[k]

    def __call__(self, variables, img: jax.Array) -> jax.Array:
        """img: [1, H, W, 3] -> seg logits [1, H, W, C]."""
        h, w = img.shape[1], img.shape[2]
        full, ctx, confidence = self._stage1(variables, img, (h, w))
        boxes = compute_slide_grid((h, w), self.crop, self.stride)
        conf_host = np.asarray(confidence)          # tiny readback
        need = np.nonzero(conf_host < self.conf)[0]
        sel = ctx
        if len(need):
            k = _bucket(len(need), self.buckets)
            idx = np.zeros(k, np.int32)
            idx[:len(need)] = need
            img_crops = extract_crops(img, boxes, self.crop)
            gathered_img = jnp.take(img_crops, jnp.asarray(idx), axis=0)
            gathered_ctx = jnp.take(ctx, jnp.asarray(idx), axis=0)
            refined = self._refine_fn(k)(variables, gathered_img, gathered_ctx)
            sel = sel.at[jnp.asarray(need)].set(refined[:len(need)])
        return accumulate_crops(sel, boxes, (h, w)), len(need)
