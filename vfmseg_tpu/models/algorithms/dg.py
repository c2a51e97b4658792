"""DomainGeneral trainer: supervised source loss + optional masked-image
consistency branch.

Rebuilds rein/models/dg/DG.py (normalizing away its backward-inside-loss
idiosyncrasy, SURVEY §3.1): the mask branch strong-transforms the source
batch (color jitter s=0.25 p=0.2, blur), block-masks it
(BlockMaskGenerator(0.7, 64)), recomputes the supervised loss and scales it
by `acc * lamda_mask(=0.5)` where acc is the source branch's pixel accuracy
(DG.py:33-56). Disabled by default like the reference (enable_mask_loss
False, DG.py:104).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.models.algorithms.augment import block_mask, strong_transform
from vfmseg_tpu.utils.misc import add_prefix

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


class DomainGeneral(nn.Module):
    """Wraps any segmentor whose __call__(img, labels) returns a loss dict."""

    model: nn.Module
    enable_mask_loss: bool = False
    color_jitter_strength: float = 0.25
    color_jitter_probability: float = 0.2
    blur: bool = True
    mask_ratio: float = 0.7
    mask_block_size: int = 64
    lamda_mask: float = 0.5
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD

    def __call__(self, img: jax.Array, labels: jax.Array) -> Dict[str, jax.Array]:
        losses = dict(self.model(img, labels))
        if not self.enable_mask_loss:
            return losses
        rng = self.make_rng("augment")
        k_aug, k_mask = jax.random.split(rng)
        mean = jnp.asarray(self.mean, img.dtype)
        std = jnp.asarray(self.std, img.dtype)
        aug = strong_transform(
            k_aug, img, mean, std, self.color_jitter_strength,
            self.color_jitter_probability, blur_prob=1.0 if self.blur else 0.0)
        masked = block_mask(k_mask, aug, self.mask_ratio, self.mask_block_size)
        mask_losses = self.model(masked, labels)
        acc_keys = [k for k in losses if "acc_seg" in k]
        acc = (losses[acc_keys[0]] / 100.0) if acc_keys else 1.0
        scale = jax.lax.stop_gradient(acc) * self.lamda_mask
        scaled = {
            k: (v * scale if "loss" in k else v) for k, v in mask_losses.items()
        }
        losses.update(add_prefix(scaled, "mask"))
        return losses

    # inference passthroughs (reference Wrapper.py:24-45 delegates predict
    # to the inner model; eval/evaluator.unwrap_model rescopes variables)
    def forward(self, img: jax.Array, train: bool = False):
        return self.model.forward(img, train=train)

    def encode_decode(self, img: jax.Array, train: bool = False):
        return self.model.encode_decode(img, train=train)

    def lr_forward(self, img: jax.Array, train: bool = False):
        return self.model.lr_forward(img, train=train)

    def hr_forward(self, img: jax.Array, context_logits: jax.Array,
                   train: bool = False, mask_enable: bool = True):
        return self.model.hr_forward(img, context_logits, train=train,
                                     mask_enable=mask_enable)
