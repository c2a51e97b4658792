"""MultiScaleEncoderDecoder — the earlier MsVFM variant with ONE shared
context-aware decode head.

Rebuilds rein/models/segmentors/MultiScale_encoder_decoder.py: the LR branch
decodes without context; the HR-crop branch decodes with the detached,
down-sampled LR logits as context through the same head
(:152-192). Inference: context-conditioned slide (:267-319).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.models.losses import cross_entropy_loss, seg_accuracy
from vfmseg_tpu.ops.resize import nearest_downsample_2x, resize


class MultiScaleEncoderDecoder(nn.Module):
    backbone: nn.Module
    decode_head: nn.Module          # context-aware head (DINOhead)
    hr_crop_size: Tuple[int, int] = (512, 512)
    crop_coord_divisible: int = 32
    detail_loss: float = 1.0
    align_corners: bool = False

    def _feats(self, img, train: bool):
        feats = self.backbone(img, deterministic=not train)
        if isinstance(feats, tuple) and len(feats) == 2 and not hasattr(feats[0], "shape"):
            feats, _ = feats
        return feats

    def lr_forward(self, img, train: bool = False):
        logits = self.decode_head(self._feats(img, train), None, train=train)
        return resize(logits, size=img.shape[1:3], method="bilinear",
                      align_corners=self.align_corners)

    def hr_forward(self, img, context_logits, train: bool = False,
                   mask_enable: bool = True):
        del mask_enable
        # context downsampled x1/4 relative to the crop (reference :152-160)
        ctx = resize(context_logits, scale_factor=0.25, method="bilinear",
                     align_corners=self.align_corners)
        logits = self.decode_head(self._feats(img, train), ctx, train=train)
        return resize(logits, size=img.shape[1:3], method="bilinear",
                      align_corners=self.align_corners)

    def __call__(self, img: jax.Array, labels: jax.Array) -> Dict[str, jax.Array]:
        ch, cw = self.hr_crop_size
        div = self.crop_coord_divisible
        h, w = img.shape[1], img.shape[2]

        lr_img = resize(img, scale_factor=0.5, method="bilinear",
                        align_corners=self.align_corners)
        lr_labels = nearest_downsample_2x(labels)
        lr_logits = self.decode_head(self._feats(lr_img, True), None, train=True)
        lr_logits = resize(lr_logits, size=lr_labels.shape[1:3],
                           method="bilinear", align_corners=self.align_corners)
        losses = {
            "decode_lr.loss_ce": cross_entropy_loss(lr_logits, lr_labels),
            "decode_lr.acc_seg": seg_accuracy(lr_logits, lr_labels),
        }

        rng = self.make_rng("crop")
        ky, kx = jax.random.split(rng)
        max_y = max((h - ch + 1) // div, 1)
        max_x = max((w - cw + 1) // div, 1)
        y1 = jax.random.randint(ky, (), 0, max_y) * div
        x1 = jax.random.randint(kx, (), 0, max_x) * div
        hr_img = jax.lax.dynamic_slice(
            img, (0, y1, x1, 0), (img.shape[0], ch, cw, img.shape[3]))
        hr_labels = jax.lax.dynamic_slice(
            labels, (0, y1, x1), (labels.shape[0], ch, cw))
        context = jax.lax.stop_gradient(jax.lax.dynamic_slice(
            lr_logits, (0, y1 // 2, x1 // 2, 0),
            (lr_logits.shape[0], ch // 2, cw // 2, lr_logits.shape[3])))
        ctx = resize(context, scale_factor=0.5, method="bilinear",
                     align_corners=self.align_corners)  # crop/4 total
        hr_logits = self.decode_head(self._feats(hr_img, True), ctx, train=True)
        hr_logits = resize(hr_logits, size=(ch, cw), method="bilinear",
                           align_corners=self.align_corners)
        losses["decode_hr.loss_ce"] = (
            cross_entropy_loss(hr_logits, hr_labels) * self.detail_loss)
        losses["decode_hr.acc_seg"] = seg_accuracy(hr_logits, hr_labels)
        return losses
