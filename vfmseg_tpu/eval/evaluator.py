"""End-to-end evaluation driver: dataset -> inference mode -> mIoU.

The functional analogue of the reference TestLoop (SURVEY §3.2): per image,
run the configured inference mode, argmax at full label resolution, stream
intersect/union into the per-dataset accumulator.

Every mode is expressed as a logits-level function
`logits_fn(variables, img) -> input-sized logits`, from which both the plain
predictor and the TTA-wrapped predictor (flip/multi-scale averaging) derive.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vfmseg_tpu.eval.metrics import IoUAccumulator
from vfmseg_tpu.eval.slide import (
    accumulate_crops,
    compute_slide_grid,
    extract_crops,
    ms_slide_inference,
    slide_inference,
)
from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor
from vfmseg_tpu.ops.resize import resize


def unwrap_model(model):
    """DomainGeneral delegates prediction to its inner model (reference
    rein/models/Wrapper.py:24-45). Flax nests the inner params/batch_stats
    under the 'model' scope, so return (inner, rescope) where rescope maps
    wrapper-level variables to inner-level ones; (model, None) otherwise."""
    from vfmseg_tpu.models.algorithms.dg import DomainGeneral

    if isinstance(model, DomainGeneral):
        def rescope(variables):
            return {
                col: (tree["model"]
                      if isinstance(tree, dict) and "model" in tree else tree)
                for col, tree in variables.items()
            }

        return model.model, rescope
    return model, None


def _msvfm_fns(model):
    def lr_fn(variables, x):
        return model.apply(variables, x, method=MsVFMSegmentor.lr_forward)

    def hr_fn(variables, crops, ctx):
        return model.apply(variables, crops, ctx, False, False,
                           method=MsVFMSegmentor.hr_forward)

    return lr_fn, hr_fn


def make_logits_fn(model, test_cfg: Dict, mode: str,
                   crop_sharding=None) -> Callable:
    """(variables, img) -> logits at the input resolution, per mode
    (reference inference modes, Ms_VFM_encoder_decoder.py:278-332).
    crop_sharding: optional NamedSharding for the slide crop batch — the
    multi-chip eval-throughput axis (SURVEY §5.7)."""
    inner, rescope = unwrap_model(model)
    if rescope is not None:
        inner_fn = make_logits_fn(inner, test_cfg, mode, crop_sharding)
        return lambda variables, img: inner_fn(rescope(variables), img)

    test_cfg = test_cfg or {}
    crop = tuple(test_cfg.get("crop_size", (512, 512)))
    stride = tuple(test_cfg.get("stride", (341, 341)))
    is_msvfm = isinstance(model, MsVFMSegmentor)

    if mode == "ms_slide_inference":
        lr_fn, hr_fn = _msvfm_fns(model)

        def logits_fn(variables, img):
            return ms_slide_inference(
                lambda x: lr_fn(variables, x),
                lambda c, t: hr_fn(variables, c, t), img,
                crop=crop, stride=tuple(test_cfg.get("stride", (320, 320))),
                lr_size=tuple(test_cfg.get("lr_img_size", (512, 1024))),
                threshold=test_cfg.get("threshold", 0.968),
                conf=test_cfg.get("conf", 0.8),
                crop_sharding=crop_sharding)

        return logits_fn

    if is_msvfm and mode in ("lr_slide_inference", "hr_slide_inference",
                             "msfull_slide_inference"):
        lr_fn, hr_fn = _msvfm_fns(model)
        stride = tuple(test_cfg.get("stride", (320, 320)))

        def logits_fn(variables, img):
            if mode == "lr_slide_inference":
                small = resize(img, scale_factor=0.5, method="bilinear")
                logits = slide_inference(
                    lambda x: lr_fn(variables, x), small, crop, stride)
                return resize(logits, scale_factor=2.0, method="bilinear")
            if mode == "hr_slide_inference":
                return slide_inference(
                    lambda x: lr_fn(variables, x), img, crop, stride)
            # msfull_slide_inference: stage-1 via slide (:288-294)
            small = resize(img, size=tuple(test_cfg.get(
                "lr_img_size", (512, 1024))), method="bilinear")
            stage1 = slide_inference(
                lambda x: lr_fn(variables, x), small, crop, stride)
            full = resize(stage1, size=img.shape[1:3], method="bilinear")
            boxes = compute_slide_grid(img.shape[1:3], crop, stride)
            refined = hr_fn(variables, extract_crops(img, boxes, crop),
                            extract_crops(full, boxes, crop))
            return accumulate_crops(refined, boxes, img.shape[1:3])

        return logits_fn

    if mode in ("slide", "lr_slide_inference", "hr_slide_inference"):
        def logits_fn(variables, img):
            return slide_inference(
                lambda crops: model.apply(variables, crops,
                                          method=type(model).encode_decode),
                img, crop, stride, crop_sharding=crop_sharding)

        return logits_fn

    def logits_fn(variables, img):  # whole
        return model.apply(variables, img, method=type(model).encode_decode)

    return logits_fn


def _finish(logits, out_hw):
    logits = resize(logits, size=out_hw, method="bilinear")
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def make_compact_ms_slide(model, test_cfg: Dict, mesh=None):
    """The reusable gated two-phase engine for `model` (eval/compact.py),
    with DomainGeneral unwrapped. Returns (engine, rescope-or-None).
    mesh: optional jax Mesh — the window/crop batch shards over its "data"
    axis (multi-chip gated eval)."""
    from vfmseg_tpu.eval.compact import CompactMsSlide

    inner, rescope = unwrap_model(model)
    lr_fn, hr_fn = _msvfm_fns(inner)
    engine = CompactMsSlide(
        lr_fn, hr_fn,
        crop=tuple(test_cfg.get("crop_size", (512, 512))),
        stride=tuple(test_cfg.get("stride", (320, 320))),
        lr_size=tuple(test_cfg.get("lr_img_size", (512, 1024))),
        threshold=test_cfg.get("threshold", 0.968),
        conf=test_cfg.get("conf", 0.8),
        mesh=mesh)
    return engine, rescope


def stream_evaluate(model, variables, test_cfg: Dict, images, out_hw,
                    group: int = 8, mesh=None, out_hw_iter=None,
                    pad_multiple: Optional[int] = None):
    """Throughput eval: yield per-image [H, W] predictions for a stream of
    preprocessed images via CompactMsSlide.stream (grouped stage-1 +
    pipelined gate; see bench.py). The stream flushes groups on shape
    changes, so per-dataset keep-ratio geometry works; `out_hw_iter`
    optionally supplies each image's label resolution (reference mmseg
    postprocess resizes logits back per image) — else `out_hw` is used
    for all. pad_multiple: optional eval shape-bucketing (`_pad_to_min`) —
    heterogeneous sets collapse onto few compiled shapes AND group
    together in the stream (same bucket => same shape => full groups)."""
    from collections import deque

    engine, rescope = make_compact_ms_slide(model, test_cfg or {}, mesh=mesh)
    if rescope is not None:
        variables = rescope(variables)
    test_cfg = test_cfg or {}
    min_hw = tuple(test_cfg.get("crop_size", (512, 512)))
    valid_q = deque()

    def padded():
        for im in images:
            p, valid_hw = _pad_to_min(im[None], min_hw,
                                      multiple=pad_multiple)
            valid_q.append(valid_hw)
            yield p[0]

    finish = jax.jit(
        lambda logits, valid_hw, hw: _finish(
            logits[:valid_hw[0], :valid_hw[1]][None], hw)[0],
        static_argnums=(1, 2))
    for logits in engine.stream(variables, padded(), group=group):
        hw = tuple(next(out_hw_iter)) if out_hw_iter is not None \
            else tuple(out_hw)
        yield finish(logits, valid_q.popleft(), hw)


def _pad_to_min(img: jax.Array, min_hw: Tuple[int, int],
                multiple: Optional[int] = None):
    """Bottom-right zero-pad (mean color post-normalization — the same fill
    SegDataPreProcessor uses) for keep-ratio images smaller than the slide
    crop (Mapillary portrait frames at the 512 protocol scale to w<512;
    the torch reference just runs the smaller tensor, which static shapes
    cannot). With `multiple` set, H and W additionally round UP to that
    multiple — the eval shape-bucketing for Mapillary-style heterogeneity
    (SURVEY §7.3): distinct keep-ratio sizes collapse onto a small grid of
    compiled shapes instead of one retrace per size. Predictions are
    cropped back to the valid region before the label-resolution resize,
    so only slide windows straddling the pad boundary see fill pixels.
    Returns (padded, valid_hw)."""
    h, w = int(img.shape[1]), int(img.shape[2])
    th, tw = max(min_hw[0], h), max(min_hw[1], w)
    if multiple:
        th = -(-th // multiple) * multiple
        tw = -(-tw // multiple) * multiple
    if th > h or tw > w:
        img = jnp.pad(img, ((0, 0), (0, th - h), (0, tw - w), (0, 0)))
    return img, (h, w)


def make_shape_aware_predict_fn(model, test_cfg: Dict, tta: bool = False,
                                mesh=None, pad_multiple: Optional[int] = None):
    """predict(variables, img, out_hw) -> [B, out_h, out_w] int labels.

    Per-dataset keep-ratio eval (reference
    configs/_base_/datasets/bdd100k_1024x1024.py:15) makes the processed
    image shape and the label resolution per-image properties — this
    predictor splits the expensive inference graph (cached per input shape
    by jax.jit) from the cheap finalize resize+argmax (cached per
    (input, out_hw) pair), so heterogeneous eval sets never recompile the
    ViT for a label-size change. pad_multiple: optional shape-bucketing
    (see _pad_to_min) bounding the number of compiled inference graphs."""
    test_cfg = test_cfg or {}
    mode = test_cfg.get("mode", "whole")
    finalize = jax.jit(_finish, static_argnums=(1,))
    # slide-family modes need at least one full crop; whole modes run any size
    min_hw = (tuple(test_cfg.get("crop_size", (512, 512)))
              if "slide" in mode else (1, 1))

    def _crop_valid(logits, valid_hw):
        if logits.shape[1:3] != valid_hw:
            logits = logits[:, :valid_hw[0], :valid_hw[1]]
        return logits

    if (mode == "ms_slide_inference" and test_cfg.get("gate") == "compact"
            and not tta):
        compact, rescope = make_compact_ms_slide(model, test_cfg, mesh=mesh)

        def predict(variables, img, out_hw):
            if rescope is not None:
                variables = rescope(variables)
            img, valid_hw = _pad_to_min(img, min_hw, multiple=pad_multiple)
            logits, _n = compact(variables, img)
            return finalize(_crop_valid(logits, valid_hw), tuple(out_hw))

        return predict

    crop_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        crop_sharding = NamedSharding(mesh, P("data"))
    logits_fn = make_logits_fn(model, test_cfg, mode, crop_sharding)
    if tta:
        from vfmseg_tpu.eval.tta import tta_logits

        scales = tuple(test_cfg.get("tta_scales", (1.0,)))
        inner = logits_fn

        def logits_fn(variables, img):  # noqa: F811 — tta wrapper
            return tta_logits(lambda view: inner(variables, view), img,
                              flip=True, scales=scales)

    logits_jit = jax.jit(logits_fn)

    def predict(variables, img, out_hw):
        img, valid_hw = _pad_to_min(img, min_hw, multiple=pad_multiple)
        logits = _crop_valid(logits_jit(variables, img), valid_hw)
        return finalize(logits, tuple(out_hw))

    return predict


def make_compact_ms_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int],
                               mesh=None):
    """Gated two-phase ms_slide (eval/compact.py): identical outputs to the
    dense path, but only low-confidence windows are refined."""
    compact, rescope = make_compact_ms_slide(model, test_cfg or {}, mesh=mesh)
    finish = jax.jit(lambda logits: _finish(logits, out_hw))

    def predict(variables, img):
        if rescope is not None:
            variables = rescope(variables)
        logits, _n = compact(variables, img)
        return finish(logits)

    return predict


def make_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int],
                    tta: bool = False, mesh=None):
    """Dispatch on test_cfg.mode; `tta` wraps the mode's logits function with
    flip(+scales) softmax averaging (eval/tta.py). out_hw: the original label
    resolution logits are resized back to before argmax (mmseg
    postprocess_result semantics). mesh: optional jax Mesh — the slide crop
    batch shards over its "data" axis (multi-chip eval)."""
    test_cfg = test_cfg or {}
    mode = test_cfg.get("mode", "whole")
    crop_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        crop_sharding = NamedSharding(mesh, P("data"))
    if (mode == "ms_slide_inference" and test_cfg.get("gate") == "compact"
            and not tta):
        return make_compact_ms_predict_fn(model, test_cfg, out_hw, mesh=mesh)

    logits_fn = make_logits_fn(model, test_cfg, mode, crop_sharding)
    if not tta:
        @jax.jit
        def predict(variables, img):
            return _finish(logits_fn(variables, img), out_hw)

        return predict

    from vfmseg_tpu.eval.tta import tta_logits

    scales = tuple(test_cfg.get("tta_scales", (1.0,)))

    @jax.jit
    def predict_tta(variables, img):
        probs = tta_logits(lambda view: logits_fn(variables, view), img,
                           flip=True, scales=scales)
        return _finish(probs, out_hw)

    return predict_tta


# backwards-compatible named constructors
def make_ms_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int]):
    return make_predict_fn(model, dict(test_cfg or {},
                                       mode="ms_slide_inference"), out_hw)


def make_whole_predict_fn(model, out_hw: Tuple[int, int]):
    return make_predict_fn(model, {"mode": "whole"}, out_hw)


def make_slide_predict_fn(model, test_cfg: Dict, out_hw: Tuple[int, int]):
    return make_predict_fn(model, dict(test_cfg or {}, mode="slide"), out_hw)


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
