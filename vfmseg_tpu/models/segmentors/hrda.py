"""HRDA multi-resolution segmentor + head.

Rebuilds rein/models/heads/hrda.py and
rein/models/segmentors/hrda_encoder_decoder.py for TPU: two-scale features
(0.5x context + 1.0x detail), a learned per-pixel scale attention
(sigmoid(AttentionHead(lr_feats))), and the fusion
    fused = att * hr_inserted + (1 - att) * lr_up            (hrda.py:149-210)
with losses on fused (x (1 - lr_w - hr_w)), lr (x lr_w) and the cropped hr
(x hr_w) branches (hrda.py:263-306).

Training uses one random aligned HR crop (hrda_encoder_decoder.py get_crop
_bbox); inference stitches overlapping HR crops as ONE batched backbone
call (TPU-native version of extract_slide_feat/batched_slide,
:125-150,232-273). The Frozen variant stop-gradients the backbone
(frozen subclass :450-464).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.eval.slide import accumulate_crops, compute_slide_grid, extract_crops
from vfmseg_tpu.models.losses import cross_entropy_loss, seg_accuracy
from vfmseg_tpu.ops.resize import resize


class HRDAHead(nn.Module):
    """Holds the shared seg head + the scale-attention head."""

    seg_head: nn.Module
    scale_attention: nn.Module
    lr_loss_weight: float = 0.0
    hr_loss_weight: float = 0.1
    align_corners: bool = False

    def seg(self, feats, train: bool = False):
        return self.seg_head(feats, train=train)

    def attention(self, feats, train: bool = False):
        return jax.nn.sigmoid(self.scale_attention(feats, train=train))

    def __call__(self, lr_feats, hr_feats, train: bool = False):
        # init path: touch every submodule
        return (self.seg(lr_feats, train), self.seg(hr_feats, train),
                self.attention(lr_feats, train))


class HRDAEncoderDecoder(nn.Module):
    backbone: nn.Module
    decode_head: HRDAHead
    scales: Tuple[float, float] = (0.5, 1.0)
    hr_crop_size: Tuple[int, int] = (512, 512)
    crop_coord_divisible: int = 8
    hr_slide_stride_divider: int = 2  # overlapping slide: stride = crop/2
    os: int = 4                       # seg-head output stride
    frozen_backbone: bool = False
    align_corners: bool = False

    def _feats(self, img, train: bool):
        feats = self.backbone(img, deterministic=not train)
        if isinstance(feats, tuple) and len(feats) == 2 and not hasattr(feats[0], "shape"):
            feats, _ = feats
        if self.frozen_backbone:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        return feats

    # ---- training -----------------------------------------------------
    def __call__(self, img: jax.Array, labels: jax.Array,
                 train: bool = True,
                 pixel_weight: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        h, w = img.shape[1], img.shape[2]
        ch, cw = self.hr_crop_size
        div = self.crop_coord_divisible
        head = self.decode_head

        lr_img = resize(img, scale_factor=self.scales[0], method="bilinear",
                        align_corners=self.align_corners)
        lr_feats = self._feats(lr_img, train)
        lr_seg = head.seg(lr_feats, train)            # [B, H*0.5/os, ...]
        att = head.attention(lr_feats, train)
        att = resize(att, size=lr_seg.shape[1:3], method="bilinear",
                     align_corners=self.align_corners)

        # random aligned HR crop (hrda_encoder_decoder.py get_crop_bbox)
        rng = self.make_rng("crop")
        ky, kx = jax.random.split(rng)
        max_y = max((h - ch + 1) // div, 1)
        max_x = max((w - cw + 1) // div, 1)
        y1 = jax.random.randint(ky, (), 0, max_y) * div
        x1 = jax.random.randint(kx, (), 0, max_x) * div
        hr_img = jax.lax.dynamic_slice(
            img, (0, y1, x1, 0), (img.shape[0], ch, cw, img.shape[3]))
        hr_feats = self._feats(hr_img, train)
        hr_seg = head.seg(hr_feats, train)            # [B, ch/os, cw/os]

        fused = self._fuse(lr_seg, hr_seg, att, (y1, x1), (h, w))

        losses: Dict[str, jax.Array] = {}
        main_w = 1.0 - head.lr_loss_weight - head.hr_loss_weight
        fused_up = resize(fused, size=(h, w), method="bilinear",
                          align_corners=self.align_corners)
        losses["loss_seg"] = main_w * cross_entropy_loss(
            fused_up, labels, pixel_weight=pixel_weight)
        losses["acc_seg"] = seg_accuracy(fused_up, labels)
        if head.lr_loss_weight > 0:
            lr_up = resize(lr_seg, size=(h, w), method="bilinear",
                           align_corners=self.align_corners)
            losses["lr.loss_seg"] = head.lr_loss_weight * cross_entropy_loss(
                lr_up, labels, pixel_weight=pixel_weight)
        if head.hr_loss_weight > 0:
            hr_labels = jax.lax.dynamic_slice(
                labels, (0, y1, x1), (labels.shape[0], ch, cw))
            hr_w = None
            if pixel_weight is not None:
                hr_w = jax.lax.dynamic_slice(
                    pixel_weight, (0, y1, x1), (labels.shape[0], ch, cw))
            hr_up = resize(hr_seg, size=(ch, cw), method="bilinear",
                           align_corners=self.align_corners)
            losses["hr.loss_seg"] = head.hr_loss_weight * cross_entropy_loss(
                hr_up, hr_labels, pixel_weight=hr_w)
            losses["hr.acc_seg"] = seg_accuracy(hr_up, hr_labels)
        return losses

    def _fuse(self, lr_seg, hr_seg, att, crop_yx, img_hw):
        """HRDAHead.forward fusion with an HR crop box (hrda.py:149-210)."""
        h, w = img_hw
        y1, x1 = crop_yx
        up = int(round(self.scales[1] / self.scales[0]))  # 2
        bsz, lh, lw, c = lr_seg.shape
        # crop mask at the lr-seg grid: original coords / (os / lr_scale)
        sc = int(round(self.os / self.scales[0]))  # 8
        rows = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 1)
        ch, cw = self.hr_crop_size
        mask = ((rows >= y1 // sc) & (rows < (y1 + ch) // sc)
                & (cols >= x1 // sc) & (cols < (x1 + cw) // sc))
        att = att * mask[None, :, :, None].astype(att.dtype)
        lr_scaled = (1.0 - att) * lr_seg
        up_lr = resize(lr_scaled, scale_factor=float(up), method="bilinear",
                       align_corners=self.align_corners)
        att_up = resize(att, scale_factor=float(up), method="bilinear",
                        align_corners=self.align_corners)
        canvas = jnp.zeros_like(up_lr)
        inserted = jax.lax.dynamic_update_slice(
            canvas, hr_seg.astype(canvas.dtype),
            (0, y1 // self.os, x1 // self.os, 0))
        return att_up * inserted + up_lr

    # ---- inference ------------------------------------------------------
    def encode_decode(self, img: jax.Array, train: bool = False) -> jax.Array:
        """Full two-scale fusion of one window, HR via overlapping batched
        slide (hrda_encoder_decoder.py:232-303)."""
        h, w = img.shape[1], img.shape[2]
        head = self.decode_head
        lr_img = resize(img, scale_factor=self.scales[0], method="bilinear",
                        align_corners=self.align_corners)
        lr_feats = self._feats(lr_img, train)
        lr_seg = head.seg(lr_feats, train)
        att = head.attention(lr_feats, train)
        att = resize(att, size=lr_seg.shape[1:3], method="bilinear",
                     align_corners=self.align_corners)

        ch, cw = self.hr_crop_size
        stride = (ch // self.hr_slide_stride_divider,
                  cw // self.hr_slide_stride_divider)
        boxes = compute_slide_grid((h, w), (ch, cw), stride)
        crops = extract_crops(img, boxes, (ch, cw))
        crop_seg = head.seg(self._feats(crops, train), train)
        os_boxes = [(y // self.os, x // self.os) for (y, x) in boxes]
        hr_seg = accumulate_crops(crop_seg, os_boxes, (h // self.os, w // self.os))

        up_lr = resize((1.0 - att) * lr_seg, scale_factor=2.0, method="bilinear",
                       align_corners=self.align_corners)
        att_up = resize(att, scale_factor=2.0, method="bilinear",
                        align_corners=self.align_corners)
        fused = att_up * hr_seg.astype(att_up.dtype) + up_lr
        return resize(fused, size=(h, w), method="bilinear",
                      align_corners=self.align_corners)

    def forward(self, img: jax.Array, train: bool = False) -> jax.Array:
        return self.encode_decode(img, train=train)
