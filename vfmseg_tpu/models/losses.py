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
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
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
