"""Host-side data pipeline transforms (numpy, mmseg-equivalent semantics).

Implements the reference's declared train pipeline
(configs/_base_/datasets/gta_1024x1024.py:5-13): LoadImageFromFile ->
LoadAnnotations -> Resize -> RandomCrop(cat_max_ratio=0.75) ->
RandomFlip(0.5) -> PhotoMetricDistortion -> PackSegInputs, plus the
SegDataPreProcessor normalization (mean/std RGB, pad to crop with 0/255 —
configs/_base_/models/lora_dinov2_ms_masked.py:6-13).

Design: label-dependent sampling (crop retries, RCS) stays on the host where
it is I/O-bound anyway (SURVEY §7.3 RNG note); everything downstream of
batching is static-shaped for the device. Images are RGB uint8 HWC; labels
are uint8/int32 HW with 255 = ignore.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IGNORE_INDEX = 255
IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


def load_image(path: str) -> np.ndarray:
    from vfmseg_tpu.data import native

    out = native.load_image(path)
    if out is not None:
        return out
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def load_label(path: str) -> np.ndarray:
    from vfmseg_tpu.data import native

    out = native.load_label(path)
    if out is not None:
        return out
    return np.asarray(Image.open(path), dtype=np.uint8)


def resize_sample(img: np.ndarray, label: Optional[np.ndarray],
                  scale_wh: Tuple[int, int], keep_ratio: bool = False):
    """mmcv Resize: scale is (w, h); bilinear (half-pixel, no antialias —
    cv2/mmcv semantics; the native path implements exactly this) for the
    image, nearest for the label."""
    w, h = scale_wh
    if keep_ratio:
        ih, iw = img.shape[:2]
        ratio = min(w / iw, h / ih)
        w, h = int(iw * ratio + 0.5), int(ih * ratio + 0.5)
    img = bilinear_resize_u8(img, (w, h))
    if label is not None:
        label = nearest_resize_u8(label, (w, h))
    return img, label


def random_choice_resize_shortest_edge(
    img: np.ndarray, label: Optional[np.ndarray],
    scales: Sequence[int], max_size: int, rng: np.random.Generator):
    """mmseg RandomChoiceResize(resize_type=ResizeShortestEdge): pick one
    target shortest-edge length uniformly from `scales`, rescale keeping
    aspect so the SHORT edge hits it, but cap the LONG edge at `max_size`
    (reference configs/rein_dinov2_mask2former_512x512_bs1x4.py:8-21 —
    16 scales 256..1024, max_size 2048). Shapes stay dynamic here; the
    downstream RandomCrop + pad-to-crop restore the static batch shape
    (SURVEY §2.6). Returns (img, label, chosen_scale)."""
    s = int(scales[int(rng.integers(len(scales)))])
    ih, iw = img.shape[:2]
    # mmcv ResizeShortestEdge._get_output_shape: scale by short edge,
    # clamp by long edge
    ratio = min(s / min(ih, iw), max_size / max(ih, iw))
    w, h = int(iw * ratio + 0.5), int(ih * ratio + 0.5)
    img = bilinear_resize_u8(img, (w, h))
    if label is not None:
        label = nearest_resize_u8(label, (w, h))
    return img, label, s


def bilinear_resize_u8(img: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    """Vectorized half-pixel bilinear (cv2/torch semantics, no antialias)."""
    w, h = wh
    ih, iw = img.shape[:2]
    if (iw, ih) == (w, h):
        return img
    sy = np.clip((np.arange(h) + 0.5) * ih / h - 0.5, 0, ih - 1)
    sx = np.clip((np.arange(w) + 0.5) * iw / w - 0.5, 0, iw - 1)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    y1 = np.minimum(y0 + 1, ih - 1)
    x1 = np.minimum(x0 + 1, iw - 1)
    fy = (sy - y0)[:, None, None]
    fx = (sx - x0)[None, :, None]
    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - fx) + f[y0][:, x1] * fx
    bot = f[y1][:, x0] * (1 - fx) + f[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return (out + 0.5).astype(np.uint8)


def nearest_resize_u8(label: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    """torch/cv2 'nearest' (floor mapping) for uint8 labels."""
    w, h = wh
    ih, iw = label.shape[:2]
    yi = (np.arange(h) * ih // h).astype(np.int64)
    xi = (np.arange(w) * iw // w).astype(np.int64)
    return label[yi][:, xi]


def random_crop(img: np.ndarray, label: np.ndarray, crop_size: Tuple[int, int],
                rng: np.random.Generator, cat_max_ratio: float = 1.0,
                ignore_index: int = IGNORE_INDEX):
    """mmseg RandomCrop: up to 10 retries until no class occupies more than
    cat_max_ratio of the (non-ignored) crop."""
    ch, cw = crop_size
    h, w = label.shape

    def _box():
        y = rng.integers(0, max(h - ch, 0) + 1)
        x = rng.integers(0, max(w - cw, 0) + 1)
        return int(y), int(x)

    y, x = _box()
    if cat_max_ratio < 1.0:
        for _ in range(10):
            patch = label[y:y + ch, x:x + cw]
            counts = np.bincount(patch.reshape(-1), minlength=256)
            counts = np.delete(counts, ignore_index)
            counts = counts[counts > 0]
            if len(counts) > 1 and counts.max() / counts.sum() < cat_max_ratio:
                break
            y, x = _box()
    return img[y:y + ch, x:x + cw], label[y:y + ch, x:x + cw]


def random_flip(img: np.ndarray, label: np.ndarray, rng: np.random.Generator,
                prob: float = 0.5):
    if rng.random() < prob:
        return img[:, ::-1], label[:, ::-1]
    return img, label


def _rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    return np.array(Image.fromarray(img).convert("HSV"), dtype=np.uint8)


def _hsv_to_rgb(img: np.ndarray) -> np.ndarray:
    return np.asarray(Image.fromarray(img, mode="HSV").convert("RGB"),
                      dtype=np.uint8)


def photometric_distortion(
    img: np.ndarray, rng: np.random.Generator,
    brightness_delta: float = 32, contrast_range=(0.5, 1.5),
    saturation_range=(0.5, 1.5), hue_delta: int = 18,
) -> np.ndarray:
    """mmseg PhotoMetricDistortion: random brightness, contrast (random
    order), saturation, hue — each applied with prob 0.5."""

    def _convert(x, alpha=1.0, beta=0.0):
        return np.clip(x.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)

    if rng.integers(2):
        img = _convert(img, beta=rng.uniform(-brightness_delta, brightness_delta))
    contrast_first = bool(rng.integers(2))

    def _contrast(x):
        if rng.integers(2):
            return _convert(x, alpha=rng.uniform(*contrast_range))
        return x

    if contrast_first:
        img = _contrast(img)
    if rng.integers(2):
        hsv = _rgb_to_hsv(img)
        hsv[..., 1] = _convert(hsv[..., 1], alpha=rng.uniform(*saturation_range))
        img = _hsv_to_rgb(hsv)
    if rng.integers(2):
        hsv = _rgb_to_hsv(img)
        delta = int(rng.uniform(-hue_delta, hue_delta))
        # PIL HSV hue channel is 0..255 (mmcv/cv2 uses 0..179; scale delta)
        delta_pil = int(round(delta * 255.0 / 180.0))
        hsv[..., 0] = ((hsv[..., 0].astype(np.int32) + delta_pil) % 256).astype(np.uint8)
        img = _hsv_to_rgb(hsv)
    if not contrast_first:
        img = _contrast(img)
    return img


def normalize_pad(img: np.ndarray, label: Optional[np.ndarray],
                  size: Tuple[int, int],
                  mean: np.ndarray = IMAGENET_MEAN,
                  std: np.ndarray = IMAGENET_STD,
                  pad_val: float = 0.0, seg_pad_val: int = IGNORE_INDEX):
    """SegDataPreProcessor: (img - mean) / std, pad bottom-right to `size`."""
    img = (img.astype(np.float32) - mean) / std
    h, w = img.shape[:2]
    th, tw = size
    if (h, w) != (th, tw):
        out = np.full((th, tw, 3), pad_val, np.float32)
        out[:h, :w] = img[:th, :tw]
        img = out
        if label is not None:
            lout = np.full((th, tw), seg_pad_val, label.dtype)
            lout[:h, :w] = label[:th, :tw]
            label = lout
    return img, label


@dataclasses.dataclass
class TrainPipeline:
    """The reference train pipeline for one (img, label) sample."""

    resize_scale_wh: Tuple[int, int] = (2560, 1440)
    crop_size: Tuple[int, int] = (1024, 1024)
    cat_max_ratio: float = 0.75
    flip_prob: float = 0.5
    photometric: bool = True
    # RandomChoiceResize/ResizeShortestEdge scale jitter (the rein_* 512
    # bs1x4 recipe): when set, REPLACES the fixed resize — a shortest-edge
    # target is drawn per sample from `scale_jitter_scales`
    scale_jitter_scales: Optional[Sequence[int]] = None
    scale_jitter_max_size: int = 2048

    def __call__(self, img: np.ndarray, label: np.ndarray,
                 rng: np.random.Generator) -> Dict[str, np.ndarray]:
        if self.scale_jitter_scales:
            img, label, _ = random_choice_resize_shortest_edge(
                img, label, self.scale_jitter_scales,
                self.scale_jitter_max_size, rng)
        else:
            img, label = resize_sample(img, label, self.resize_scale_wh)
        img, label = random_crop(img, label, self.crop_size, rng,
                                 self.cat_max_ratio)
        img, label = random_flip(img, label, rng, self.flip_prob)
        if self.photometric:
            img = photometric_distortion(img, rng)
        img, label = normalize_pad(np.ascontiguousarray(img),
                                   np.ascontiguousarray(label), self.crop_size)
        return {"img": img, "label": label.astype(np.int32)}


@dataclasses.dataclass
class TestPipeline:
    """Resize-only eval pipeline (cityscapes_1024x1024.py:13-20).

    keep_ratio defaults True: every reference test pipeline resizes with
    `keep_ratio=True` (configs/_base_/datasets/bdd100k_1024x1024.py:15,
    mapillary/cityscapes same) — BDD 1280x720 scales to 1820x1024, NOT a
    2048x1024 stretch; Mapillary's arbitrary sizes each keep their aspect.
    mIoU is computed at the ORIGINAL label resolution (mmseg postprocess
    resizes the logits back), so the label passes through untouched.
    """

    resize_scale_wh: Optional[Tuple[int, int]] = (2048, 1024)
    keep_ratio: bool = True

    def __call__(self, img: np.ndarray,
                 label: Optional[np.ndarray]) -> Dict[str, np.ndarray]:
        orig_label = label
        if self.resize_scale_wh is not None:
            img, _ = resize_sample(img, None, self.resize_scale_wh,
                                   self.keep_ratio)
        img = (img.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
        out = {"img": img}
        if orig_label is not None:
            out["label"] = orig_label.astype(np.int32)
        return out
