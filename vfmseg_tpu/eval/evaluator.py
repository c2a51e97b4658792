"""End-to-end evaluation driver: dataset -> two-stage inference -> mIoU.

The functional analogue of the reference TestLoop (SURVEY §3.2): per image,
run the configured inference mode, argmax at full label resolution, stream
intersect/union into the per-dataset accumulator.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.eval.metrics import IoUAccumulator
from vfmseg_tpu.eval.slide import ms_slide_inference, slide_inference
from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor
from vfmseg_tpu.ops.resize import resize


def make_ms_predict_fn(model: MsVFMSegmentor, test_cfg: Dict,
                       out_hw: Tuple[int, int]):
    """Jitted [B,H,W,3] -> [B,out_h,out_w] class map via ms_slide_inference.

    out_hw: the original label resolution logits are resized back to before
    argmax (mmseg postprocess_result semantics).
    """

    @jax.jit
    def predict(variables, img):
        def lr_fn(x):
            return model.apply(variables, x, method=MsVFMSegmentor.lr_forward)

        def hr_fn(crops, ctx):
            return model.apply(variables, crops, ctx, False, False,
                               method=MsVFMSegmentor.hr_forward)

        logits = ms_slide_inference(
            lr_fn, hr_fn, img,
            crop=tuple(test_cfg.get("crop_size", (512, 512))),
            stride=tuple(test_cfg.get("stride", (320, 320))),
            lr_size=tuple(test_cfg.get("lr_img_size", (512, 1024))),
            threshold=test_cfg.get("threshold", 0.968),
            conf=test_cfg.get("conf", 0.8),
        )
        logits = resize(logits, size=out_hw, method="bilinear")
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return predict


def make_whole_predict_fn(model, out_hw: Tuple[int, int]):
    @jax.jit
    def predict(variables, img):
        logits = model.apply(variables, img, method=type(model).encode_decode)
        logits = resize(logits, size=out_hw, method="bilinear")
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return predict


def make_slide_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int]):
    """mmseg slide inference (batched crops) for plain encoder-decoders."""

    @jax.jit
    def predict(variables, img):
        def logits_fn(crops):
            return model.apply(variables, crops,
                               method=type(model).encode_decode)

        logits = slide_inference(
            logits_fn, img, tuple(test_cfg.get("crop_size", (512, 512))),
            tuple(test_cfg.get("stride", (341, 341))))
        logits = resize(logits, size=out_hw, method="bilinear")
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return predict


def make_compact_ms_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int]):
    """Gated two-phase ms_slide (eval/compact.py): identical outputs to the
    dense path, but low-confidence windows are the only ones refined."""
    from vfmseg_tpu.eval.compact import CompactMsSlide

    def lr_fn(variables, x):
        return model.apply(variables, x, method=MsVFMSegmentor.lr_forward)

    def hr_fn(variables, crops, ctx):
        return model.apply(variables, crops, ctx, False, False,
                           method=MsVFMSegmentor.hr_forward)

    compact = CompactMsSlide(
        lr_fn, hr_fn,
        crop=tuple(test_cfg.get("crop_size", (512, 512))),
        stride=tuple(test_cfg.get("stride", (320, 320))),
        lr_size=tuple(test_cfg.get("lr_img_size", (512, 1024))),
        threshold=test_cfg.get("threshold", 0.968),
        conf=test_cfg.get("conf", 0.8))

    @functools.partial(jax.jit, static_argnums=())
    def _finish(logits):
        logits = resize(logits, size=out_hw, method="bilinear")
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def predict(variables, img):
        logits, _n = compact(variables, img)
        return _finish(logits)

    return predict


def make_msvfm_mode_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int],
                               mode: str):
    """MsVFM's remaining inference modes (Ms_VFM_encoder_decoder.py:278-332):
    lr_slide (0.5x slide then 2x upsample), hr_slide (full-res slide of the
    coarse head), msfull_slide (stage-1 via slide instead of whole)."""
    crop = tuple(test_cfg.get("crop_size", (512, 512)))
    stride = tuple(test_cfg.get("stride", (320, 320)))

    @jax.jit
    def predict(variables, img):
        def lr_fn(x):
            return model.apply(variables, x, method=MsVFMSegmentor.lr_forward)

        def hr_fn(crops, ctx):
            return model.apply(variables, crops, ctx, False, False,
                               method=MsVFMSegmentor.hr_forward)

        if mode == "lr_slide_inference":
            small = resize(img, scale_factor=0.5, method="bilinear")
            logits = slide_inference(lr_fn, small, crop, stride)
            logits = resize(logits, scale_factor=2.0, method="bilinear")
        elif mode == "hr_slide_inference":
            logits = slide_inference(lr_fn, img, crop, stride)
        else:  # msfull_slide_inference: stage-1 slide at half res (:288-294)
            small = resize(img, size=tuple(test_cfg.get(
                "lr_img_size", (512, 1024))), method="bilinear")
            stage1 = slide_inference(lr_fn, small, crop, stride)
            full = resize(stage1, size=img.shape[1:3], method="bilinear")
            from vfmseg_tpu.eval.slide import (
                accumulate_crops, compute_slide_grid, extract_crops)

            boxes = compute_slide_grid(img.shape[1:3], crop, stride)
            img_crops = extract_crops(img, boxes, crop)
            ctx_crops = extract_crops(full, boxes, crop)
            refined = hr_fn(img_crops, ctx_crops)
            logits = accumulate_crops(refined, boxes, img.shape[1:3])
        logits = resize(logits, size=out_hw, method="bilinear")
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return predict


def make_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int],
                    tta: bool = False):
    """Dispatch on test_cfg.mode (reference inference modes, SURVEY §3.2).
    tta wraps the predictor with flip(+scales) averaging (eval/tta.py)."""
    mode = (test_cfg or {}).get("mode", "whole")
    is_msvfm = isinstance(model, MsVFMSegmentor)
    if mode == "ms_slide_inference" and (test_cfg or {}).get("gate") == "compact":
        base = make_compact_ms_predict_fn(model, test_cfg, out_hw)
    elif mode == "ms_slide_inference":
        base = make_ms_predict_fn(model, test_cfg, out_hw)
    elif is_msvfm and mode in ("lr_slide_inference", "hr_slide_inference",
                               "msfull_slide_inference"):
        base = make_msvfm_mode_predict_fn(model, test_cfg, out_hw, mode)
    elif mode in ("slide", "lr_slide_inference", "hr_slide_inference"):
        base = make_slide_predict_fn(model, test_cfg, out_hw)
    else:
        base = make_whole_predict_fn(model, out_hw)
    if not tta:
        return base
    from vfmseg_tpu.eval.tta import tta_logits

    scales = tuple((test_cfg or {}).get("tta_scales", (1.0,)))

    @jax.jit
    def predict(variables, img):
        def logits_fn(view):
            # reuse the argmax-free core by re-running the base pipeline at
            # logits level: encode through the model's encode_decode
            return model.apply(variables, view,
                               method=type(model).encode_decode)

        probs = tta_logits(logits_fn, img, flip=True, scales=scales)
        probs = resize(probs, size=out_hw, method="bilinear")
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    return predict


def evaluate(
    predict_fn, variables, dataset, *,
    num_classes: int = 19,
    dataset_key: str = "default",
    accumulator: Optional[IoUAccumulator] = None,
    pipeline=None,
    max_images: Optional[int] = None,
    progress_every: int = 50,
    log=print,
) -> IoUAccumulator:
    acc = accumulator or IoUAccumulator(num_classes=num_classes,
                                        dataset_keys=[dataset_key])
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for i in range(n):
        raw = dataset[i] if pipeline is None else pipeline(
            **{k: v for k, v in dataset[i].items() if k in ("img", "label")})
        img = jnp.asarray(raw["img"])[None]
        pred = predict_fn(variables, img)[0]
        acc.update(pred, raw["label"], raw.get("seg_map_path", dataset_key))
        if progress_every and (i + 1) % progress_every == 0:
            log(f"eval {i + 1}/{n}")
    return acc
