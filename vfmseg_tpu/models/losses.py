"""Segmentation losses and accuracy with mmseg-matching semantics.

The reference uses mmseg ``CrossEntropyLoss(use_sigmoid=False, loss_weight=1)``
with default ``avg_non_ignore=False`` (configs/_base_/models/
lora_dinov2_ms_masked.py:48-49): per-pixel CE with ignore_index=255 zeroed,
then a mean over *all* pixels (ignored pixels count in the denominator).
``acc_seg`` is top-1 accuracy over non-ignored pixels
(rein/models/heads/utils.py:35-79).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,          # [B, H, W, C] (NHWC)
    labels: jax.Array,          # [B, H, W] int
    ignore_index: int = 255,
    avg_non_ignore: bool = False,
    pixel_weight: Optional[jax.Array] = None,  # [B, H, W] per-pixel weight
    loss_weight: float = 1.0,
) -> jax.Array:
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    # nll = logsumexp(logits) - logits[label], with the label pick as a
    # one-hot lane reduction instead of take_along_axis: a per-pixel gather
    # over the MINOR (class) axis has no vector-gather lowering on TPU and
    # measured 7.3 ms per bs2 512^2x19 call — ~15 ms of the 99 ms train
    # step across the two scale branches; the one-hot multiply-reduce and
    # the explicit max/exp/sum run as plain VPU lane ops (<1 ms). Same
    # math as log_softmax+gather (identical reduction tree in fp32).
    lg = logits.astype(jnp.float32)
    m = jnp.max(lg, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(lg - m[..., None]), axis=-1))
    one_hot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32)
    picked = jnp.sum(lg * one_hot, axis=-1)
    nll = jnp.where(valid, lse - picked, 0.0)
    if pixel_weight is not None:
        nll = nll * pixel_weight.astype(nll.dtype)
    if avg_non_ignore:
        denom = jnp.maximum(jnp.sum(valid), 1)
    else:
        denom = nll.size
    del num_classes
    return loss_weight * jnp.sum(nll) / denom


def seg_accuracy(
    logits: jax.Array, labels: jax.Array, ignore_index: int = 255
) -> jax.Array:
    """Top-1 pixel accuracy (%) over non-ignored pixels."""
    pred = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_index
    correct = jnp.sum(jnp.where(valid, pred == labels, False))
    total = jnp.maximum(jnp.sum(valid), 1)
    return 100.0 * correct / total
