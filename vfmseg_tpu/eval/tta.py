"""Test-time augmentation: horizontal-flip and multi-scale logit averaging.

The reference exposes --tta through mmengine's SegTTAModel (tools/
test.py:131-134; its tta_pipeline is actually missing from the repo — the
working TTA lives inside HRDA's slide_inference flip/multi-scale options,
hrda_encoder_decoder.py:194-229). Here TTA wraps any logits-level predict
function: average softmax over flips and scales, all inside jit.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from vfmseg_tpu.ops.resize import resize


def tta_logits(
    logits_fn: Callable[[jax.Array], jax.Array],
    img: jax.Array,
    *,
    flip: bool = True,
    scales: Sequence[float] = (1.0,),
    align_corners: bool = False,
) -> jax.Array:
    """Averaged softmax probabilities over {scales} x {identity, h-flip}.

    logits_fn: [B, h, w, 3] -> [B, h, w, C] (input-sized logits).
    Returns [B, H, W, C] probabilities at the original size.
    """
    h, w = img.shape[1], img.shape[2]
    acc = None
    count = 0
    for s in scales:
        if s == 1.0:
            scaled = img
        else:
            scaled = resize(img, size=(int(h * s), int(w * s)),
                            method="bilinear", align_corners=align_corners)
        views = [scaled]
        if flip:
            views.append(scaled[:, :, ::-1])
        for i, view in enumerate(views):
            logits = logits_fn(view)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            if i == 1:
                probs = probs[:, :, ::-1]
            if probs.shape[1:3] != (h, w):
                probs = resize(probs, size=(h, w), method="bilinear",
                               align_corners=align_corners)
            acc = probs if acc is None else acc + probs
            count += 1
    return acc / count
