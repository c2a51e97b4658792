"""Segmentor for Mask2Former-style set-prediction heads.

The reference uses a plain mmseg EncoderDecoder whose decode head is a
(Rein)Mask2FormerHead; training runs the set-prediction loss and inference
composes softmax(cls) x sigmoid(mask) into semantic logits (mmseg
Mask2Former semantics; SURVEY §2.4/§2.5). Rein backbones pass their query
vector into the head (rein_mask2former.py:26-30).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.models.heads.m2f_loss import mask2former_loss
from vfmseg_tpu.models.heads.mask2former import semantic_inference
from vfmseg_tpu.ops.resize import resize


class MaskFormerSegmentor(nn.Module):
    backbone: nn.Module
    decode_head: nn.Module          # Mask2FormerHead
    num_classes: int = 19
    num_points: int = 12544
    align_corners: bool = False
    frozen_backbone: bool = False   # FrozenBackboneEncoderDecoder variant

    def _feats_queries(self, img, train: bool):
        out = self.backbone(img, deterministic=not train)
        if isinstance(out, tuple) and len(out) == 2 and not hasattr(out[0], "shape"):
            feats, queries = out
        else:
            feats, queries = out, None
        if self.frozen_backbone:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
            if queries is not None:
                queries = jax.lax.stop_gradient(queries)
        return feats, queries

    def forward(self, img: jax.Array, train: bool = False) -> jax.Array:
        """Semantic logits at mask resolution (stride 4), NHWC."""
        feats, queries = self._feats_queries(img, train)
        cls_preds, mask_preds = self.decode_head(feats, queries, train=train)
        return semantic_inference(cls_preds[-1], mask_preds[-1], self.num_classes)

    def encode_decode(self, img: jax.Array, train: bool = False) -> jax.Array:
        logits = self.forward(img, train=train)
        return resize(logits, size=img.shape[1:3], method="bilinear",
                      align_corners=self.align_corners)

    def __call__(self, img: jax.Array, labels: jax.Array, train: bool = True,
                 pixel_weight: jax.Array = None) -> Dict[str, jax.Array]:
        """Training: multi-stage Hungarian-matched losses. pixel_weight (used
        by DACS pseudo-labels) scales the set losses by its mean — the
        per-pixel weighting has no direct analogue in set prediction."""
        del train
        feats, queries = self._feats_queries(img, True)
        cls_preds, mask_preds = self.decode_head(feats, queries, train=True)
        rng = self.make_rng("mask")
        losses = mask2former_loss(
            cls_preds, mask_preds, labels, rng,
            num_classes=self.num_classes, num_points=self.num_points)
        if pixel_weight is not None:
            scale = jnp.mean(pixel_weight)
            losses = {k: (v * scale if "loss" in k else v)
                      for k, v in losses.items()}
        return losses
