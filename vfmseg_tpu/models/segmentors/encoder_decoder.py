"""Plain encoder-decoder segmentor (backbone + decode head).

The functional analogue of mmseg's EncoderDecoder as used by the reference's
frozen/linear configs (SURVEY §2.5). Training losses and sliding-window
orchestration live outside the module (train/step.py, eval/slide.py); the
module only defines pure forward passes over the parameter tree.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.models.losses import cross_entropy_loss, seg_accuracy
from vfmseg_tpu.ops.resize import resize


class EncoderDecoder(nn.Module):
    backbone: nn.Module
    decode_head: nn.Module
    align_corners: bool = False
    # FrozenBackboneEncoderDecoder (frozen_encoder_decoder.py:19-34): the
    # functional analogue of eval+no-grad+detach is a stop_gradient on the
    # features (param freezing itself is the PEFT partition's job)
    frozen_backbone: bool = False

    def forward(self, img: jax.Array, train: bool = False) -> jax.Array:
        """Forward to head logits at the head's native stride (NHWC)."""
        feats = self.backbone(img, deterministic=not train or self.frozen_backbone)
        if isinstance(feats, tuple) and len(feats) == 2 and not hasattr(feats[0], "shape"):
            feats, _queries = feats  # Rein backbones also return queries
        if self.frozen_backbone:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        return self.decode_head(feats, train=train)

    def encode_decode(self, img: jax.Array, train: bool = False) -> jax.Array:
        """Logits resized to the input resolution (mmseg encode_decode)."""
        logits = self.forward(img, train=train)
        return resize(logits, size=img.shape[1:3], method="bilinear",
                      align_corners=self.align_corners)

    def __call__(self, img: jax.Array, labels: jax.Array, train: bool = True,
                 pixel_weight: jax.Array = None):
        """Training losses: CE + accuracy vs labels at label resolution
        (linear_head.py:72-113). pixel_weight: optional [B, H, W] per-pixel
        loss weights (DACS pseudo-label confidence, dacs.py:253-279)."""
        logits = self.forward(img, train=train)
        logits = resize(logits, size=labels.shape[1:3], method="bilinear",
                        align_corners=self.align_corners)
        losses = {
            "decode.loss_ce": cross_entropy_loss(logits, labels,
                                                 pixel_weight=pixel_weight),
            "decode.acc_seg": seg_accuracy(logits, labels),
        }
        return losses
