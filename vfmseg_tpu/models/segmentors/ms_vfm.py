"""MsVFM segmentor — the paper's core two-scale masked-context scheme.

Rebuilds rein/models/segmentors/Ms_VFM_encoder_decoder.py as pure functions
over a parameter tree:

Training (forward_train, reference :170-200):
  * scale 0.5: full image -> backbone -> LinearHead; CE vs 2x-downsampled GT
  * scale 1.0: random aligned crop (crop_coord_divisible=32, :34-46) ->
    backbone -> VFMHead conditioned on the *detached* LR logits cropped to
    the HR box (get_seg_logits :160-167); CE scaled by detail_loss (:193-195)

Inference methods (`lr_forward`, `hr_forward`) are the building blocks the
batched two-stage slide engine (eval/slide.py) drives; the data-dependent
confidence gate lives there.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.models.losses import cross_entropy_loss, seg_accuracy
from vfmseg_tpu.ops.resize import nearest_downsample_2x, resize


class MsVFMSegmentor(nn.Module):
    backbone: nn.Module
    decode_head: nn.Module          # LinearHead (coarse)
    aux_head: nn.Module             # VFMHead (context-conditioned refine)
    hr_crop_size: Tuple[int, int] = (512, 512)
    crop_coord_divisible: int = 32
    detail_loss: float = 1.0
    align_corners: bool = False

    def _feats(self, img: jax.Array, train: bool):
        feats = self.backbone(img, deterministic=not train)
        if isinstance(feats, tuple) and len(feats) == 2 and not hasattr(feats[0], "shape"):
            feats, _ = feats
        return feats

    def lr_forward(self, img: jax.Array, train: bool = False) -> jax.Array:
        """Coarse path: backbone + LinearHead logits resized to img size
        (whole_inference semantics, Ms_VFM_encoder_decoder.py:420)."""
        logits = self.decode_head(self._feats(img, train), train=train)
        return resize(logits, size=img.shape[1:3], method="bilinear",
                      align_corners=self.align_corners)

    def hr_forward(self, img: jax.Array, context_logits: jax.Array,
                   train: bool = False, mask_enable: bool = True) -> jax.Array:
        """Refine path: backbone + VFMHead(context) logits resized to img size
        (enc_dec, reference :268-276, :450-453)."""
        logits = self.aux_head(self._feats(img, train), context_logits,
                               train=train, mask_enable=mask_enable)
        return resize(logits, size=img.shape[1:3], method="bilinear",
                      align_corners=self.align_corners)

    def __call__(self, img: jax.Array, labels: jax.Array) -> Dict[str, jax.Array]:
        """Two-scale training loss (used for init and by the train step).

        img: [B, H, W, 3] preprocessed; labels: [B, H, W] int with 255 ignore.
        Needs rngs: 'crop' (HR crop box), 'mask' (mask tokens), 'dropout'.
        """
        ch, cw = self.hr_crop_size
        div = self.crop_coord_divisible
        h, w = img.shape[1], img.shape[2]

        # ---- LR branch: 0.5x full view --------------------------------
        lr_img = resize(img, scale_factor=0.5, method="bilinear",
                        align_corners=self.align_corners)
        lr_labels = nearest_downsample_2x(labels)

        # ---- HR branch: random aligned crop at full scale --------------
        rng = self.make_rng("crop")
        ky, kx = jax.random.split(rng)
        # reference get_crop_bbox (:34-46): offset = randint(0, (margin+1)//div)*div
        max_y = max((h - ch + 1) // div, 1)
        max_x = max((w - cw + 1) // div, 1)
        y1 = jax.random.randint(ky, (), 0, max_y) * div
        x1 = jax.random.randint(kx, (), 0, max_x) * div

        hr_img = jax.lax.dynamic_slice(
            img, (0, y1, x1, 0), (img.shape[0], ch, cw, img.shape[3]))
        hr_labels = jax.lax.dynamic_slice(
            labels, (0, y1, x1), (labels.shape[0], ch, cw))

        # The backbone (a frozen ViT-L, the dominant FLOPs) sees both scale
        # views in ONE batched call when their shapes match (they do in the
        # headline 1024^2 configs: the 0.5x view and the HR crop are both
        # 512^2). The two passes have no dependency through the backbone —
        # the HR head's context comes from the LR *head* logits — and the
        # reference only runs them sequentially because torch modules are
        # stateful (Ms_VFM_encoder_decoder.py:125-141). Doubling the batch
        # doubles the arithmetic intensity of every per-block matmul, the
        # single largest train-MFU lever (measured in BENCH_train_r05).
        b = img.shape[0]
        if lr_img.shape[1:3] == (ch, cw):
            feats_all = self._feats(
                jnp.concatenate([lr_img, hr_img], axis=0), True)
            if not isinstance(feats_all, (tuple, list)):
                feats_all = (feats_all,)
                lr_feats, hr_feats = feats_all[0][:b], feats_all[0][b:]
            else:
                lr_feats = tuple(f[:b] for f in feats_all)
                hr_feats = tuple(f[b:] for f in feats_all)
        else:
            lr_feats = self._feats(lr_img, True)
            hr_feats = self._feats(hr_img, True)

        lr_logits = self.decode_head(lr_feats, train=True)
        lr_logits = resize(lr_logits, size=lr_labels.shape[1:3], method="bilinear",
                           align_corners=self.align_corners)
        losses = {
            "decode_lr.loss_ce": cross_entropy_loss(lr_logits, lr_labels),
            "decode_lr.acc_seg": seg_accuracy(lr_logits, lr_labels),
        }

        # context: detached LR logits cropped to the HR box at half res
        # (get_seg_logits :160-167; box coords are divisible by 2)
        context = jax.lax.stop_gradient(
            jax.lax.dynamic_slice(
                lr_logits, (0, y1 // 2, x1 // 2, 0),
                (lr_logits.shape[0], ch // 2, cw // 2, lr_logits.shape[3]),
            )
        )

        hr_logits = self.aux_head(hr_feats, context,
                                  train=True, mask_enable=True)
        hr_logits = resize(hr_logits, size=(ch, cw), method="bilinear",
                           align_corners=self.align_corners)
        losses["decode_hr.loss_ce"] = (
            cross_entropy_loss(hr_logits, hr_labels) * self.detail_loss)
        losses["decode_hr.acc_seg"] = seg_accuracy(hr_logits, hr_labels)
        return losses
