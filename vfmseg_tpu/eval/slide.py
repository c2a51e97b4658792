"""Batched sliding-window inference.

The reference iterates crops in Python, one full ViT forward per
low-confidence crop (Ms_VFM_encoder_decoder.py:424-461). TPU-native design
(SURVEY §5.7): the crop grid is static per (image size, crop, stride), so all
crops are extracted into one batch and run as a single large ViT call — the
MXU sees batch G*B instead of G sequential launches — and overlap-averaging
is a static scatter-add. The data-dependent confidence gate (:446-452)
becomes compute-all + select: every crop is refined, and the gate chooses
between refined logits and the stage-1 context per crop (bitwise-identical
outputs to the reference's skip since skipped crops contribute `context`).

All functions take `logits_fn`-style callables so they work with any
segmentor; everything is jit-compatible with static shapes.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from vfmseg_tpu.ops.resize import resize


def compute_slide_grid(img_hw: Tuple[int, int], crop: Tuple[int, int],
                       stride: Tuple[int, int]) -> List[Tuple[int, int]]:
    """Static (y1, x1) crop origins — mmseg slide grid (reference :424-440)."""
    h, w = img_hw
    ch, cw = crop
    sh, sw = stride
    h_grids = max(h - ch + sh - 1, 0) // sh + 1
    w_grids = max(w - cw + sw - 1, 0) // sw + 1
    boxes = []
    for hi in range(h_grids):
        for wi in range(w_grids):
            y2 = min(hi * sh + ch, h)
            x2 = min(wi * sw + cw, w)
            boxes.append((max(y2 - ch, 0), max(x2 - cw, 0)))
    return boxes


def extract_crops(x: jax.Array, boxes: Sequence[Tuple[int, int]],
                  crop: Tuple[int, int]) -> jax.Array:
    """[B,H,W,C] -> [G*B, ch, cw, C] crop batch (static slices)."""
    ch, cw = crop
    crops = [x[:, y1:y1 + ch, x1:x1 + cw] for (y1, x1) in boxes]
    return jnp.concatenate(crops, axis=0)


@functools.lru_cache(maxsize=64)
def _coverage_inv(boxes: Tuple[Tuple[int, int], ...], crop: Tuple[int, int],
                  out_hw: Tuple[int, int]):
    """Static per-pixel 1/coverage of the slide grid (host-computed: the
    count plane is pure geometry, so scatter-adding it on device and
    dividing was two wasted HBM passes). Returns numpy — converting to a
    device constant per trace keeps cached values out of jit scopes."""
    import numpy as np

    count = np.zeros((out_hw[0], out_hw[1], 1), np.float32)
    ch, cw = crop
    for (y1, x1) in boxes:
        count[y1:y1 + ch, x1:x1 + cw] += 1.0
    # hand-built box lists may leave pixels uncovered (the scatter-fallback
    # path supports them): those stay 0, not inf/NaN
    return np.where(count > 0, 1.0 / np.maximum(count, 1.0), 0.0)


@functools.lru_cache(maxsize=64)
def _coverage_bands(boxes: Tuple[Tuple[int, int], ...], crop: Tuple[int, int],
                    out_hw: Tuple[int, int]):
    """Decompose the output into (y-band, x-band) cells of constant window
    coverage. Returns (y_bands, x_bands) where each band is
    (start, stop, covering window indices along that axis, offsets)."""
    ch, cw = crop

    def bands(starts, size, extent):
        cuts = sorted({0, extent} | {s for s in starts} |
                      {min(s + size, extent) for s in starts})
        out = []
        for a, bnd in zip(cuts[:-1], cuts[1:]):
            cover = [(i, a - s) for i, s in enumerate(starts)
                     if s <= a and bnd <= s + size]
            out.append((a, bnd, tuple(cover)))
        return tuple(out)

    ys = [y for (y, _) in boxes]
    xs = [x for (_, x) in boxes]
    # boxes form a grid: unique sorted y-starts x x-starts, window index
    # = yi * n_x + xi (compute_slide_grid ordering)
    uy = sorted(set(ys))
    ux = sorted(set(xs))
    return bands(uy, ch, out_hw[0]), bands(ux, cw, out_hw[1]), len(ux)


def accumulate_crops(crop_logits: jax.Array, boxes: Sequence[Tuple[int, int]],
                     out_hw: Tuple[int, int]) -> jax.Array:
    """Overlap-average [G*B, ch, cw, C] crop logits into [B, H, W, C].

    Gather formulation: the slide grid statically partitions the output
    into bands of constant window coverage, so each output cell is a plain
    sum of crop slices — no scatter. XLA's scatter-add lowering measured
    ~9x slower than the HBM traffic warrants (62 ms/group at bs8
    1024x2048); this reads every crop element exactly once. Slices are
    summed in ascending window order, matching the scatter version's fp32
    SUMMATION order bit-for-bit (the final normalization multiplies by a
    precomputed reciprocal, which may differ from an explicit division in
    the last ulp).
    """
    g = len(boxes)
    b = crop_logits.shape[0] // g
    ch, cw, c = crop_logits.shape[1:]
    uy = sorted({y for (y, _) in boxes})
    ux = sorted({x for (_, x) in boxes})
    if list(boxes) != [(y, x) for y in uy for x in ux]:
        # not a row-major grid (e.g. hand-built box lists): scatter fallback
        preds = jnp.zeros((b, out_hw[0], out_hw[1], c), dtype=jnp.float32)
        for i, (y1, x1) in enumerate(boxes):
            piece = crop_logits[i * b:(i + 1) * b].astype(jnp.float32)
            preds = preds.at[:, y1:y1 + ch, x1:x1 + cw].add(piece)
        return preds * jnp.asarray(
            _coverage_inv(tuple(boxes), (ch, cw), tuple(out_hw)))
    y_bands, x_bands, n_x = _coverage_bands(tuple(boxes), (ch, cw),
                                            tuple(out_hw))
    inv = _coverage_inv(tuple(boxes), (ch, cw), tuple(out_hw))

    rows = []
    for (ya, yb, ycov) in y_bands:
        cols = []
        for (xa, xb, xcov) in x_bands:
            cell = None
            for (yi, yoff) in ycov:
                for (xi, xoff) in xcov:
                    w = yi * n_x + xi
                    piece = jax.lax.slice(
                        crop_logits,
                        (w * b, yoff, xoff, 0),
                        (w * b + b, yoff + (yb - ya), xoff + (xb - xa), c),
                    ).astype(jnp.float32)
                    cell = piece if cell is None else cell + piece
            cell = cell * jnp.asarray(inv[ya:yb, xa:xb])
            cols.append(cell)
        rows.append(jnp.concatenate(cols, axis=2) if len(cols) > 1
                    else cols[0])
    return jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]


def confident_mask(logits: jax.Array, threshold: float) -> jax.Array:
    """0/1 fp32 mask of pixels whose max softmax prob exceeds `threshold`.

    Computed as sum_j exp(x_j - x_max) < 1/threshold — algebraically equal
    to max(softmax(x)) > threshold (the reference gate,
    Ms_VFM_encoder_decoder.py:446-452) without materializing the [..., C]
    probability tensor: the softmax's exp/sum/div passes collapse into one
    fused max + exp-sum sweep (measured 6.5 -> ~3 ms per bs8 1024x2048
    group at gate time). Both the dense and the compact gate call THIS
    function, so their decisions stay bitwise identical to each other.
    """
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    s = jnp.sum(jnp.exp(x - m), axis=-1)
    return (s < 1.0 / threshold).astype(jnp.float32)


def whole_inference(logits_fn: Callable[[jax.Array], jax.Array],
                    img: jax.Array) -> jax.Array:
    """Single full-image forward; logits_fn must return input-sized logits."""
    return logits_fn(img)


def slide_inference(logits_fn: Callable[[jax.Array], jax.Array],
                    img: jax.Array, crop: Tuple[int, int],
                    stride: Tuple[int, int], crop_sharding=None) -> jax.Array:
    """mmseg slide_inference, batched: one model call over all crops."""
    boxes = compute_slide_grid(img.shape[1:3], crop, stride)
    crops = extract_crops(img, boxes, crop)
    if crop_sharding is not None:
        crops = jax.lax.with_sharding_constraint(crops, crop_sharding)
    crop_logits = logits_fn(crops)
    return accumulate_crops(crop_logits, boxes, img.shape[1:3])


def ms_slide_inference(
    lr_logits_fn: Callable[[jax.Array], jax.Array],
    hr_logits_fn: Callable[[jax.Array, jax.Array], jax.Array],
    img: jax.Array,
    *,
    crop: Tuple[int, int] = (512, 512),
    stride: Tuple[int, int] = (320, 320),
    lr_size: Tuple[int, int] = (512, 1024),
    threshold: float = 0.968,
    conf: float = 0.8,
    align_corners: bool = False,
    crop_sharding=None,
) -> jax.Array:
    """Two-stage coarse-to-fine inference (ms_inference, reference :400-466).

    Stage 1: whole-image pass at `lr_size`, upsampled to full resolution.
    Stage 2: slide `crop` windows at `stride`; per window, if the fraction of
    pixels whose max softmax exceeds `threshold` is >= `conf`, reuse the
    stage-1 context, else refine with the context-conditioned head. All
    windows are refined in ONE batched call; the gate selects per window.
    """
    h, w = img.shape[1], img.shape[2]

    # ---- stage 1: coarse whole-image context -------------------------
    lr_img = resize(img, size=lr_size, method="bilinear",
                    align_corners=align_corners)
    lr_logits = lr_logits_fn(lr_img)
    full_logits = resize(lr_logits, size=(h, w), method="bilinear",
                         align_corners=align_corners)

    # ---- stage 2: confidence-gated batched refinement -----------------
    boxes = compute_slide_grid((h, w), crop, stride)
    g, b = len(boxes), img.shape[0]
    img_crops = extract_crops(img, boxes, crop)            # [G*B, ch, cw, 3]
    ctx_crops = extract_crops(full_logits, boxes, crop)    # [G*B, ch, cw, C]
    if crop_sharding is not None:
        # shard the crop batch over the data axis: the natural multi-chip
        # axis for eval throughput (SURVEY §5.7)
        img_crops = jax.lax.with_sharding_constraint(img_crops, crop_sharding)
        ctx_crops = jax.lax.with_sharding_constraint(ctx_crops, crop_sharding)

    confidence = jnp.mean(confident_mask(ctx_crops, threshold),
                          axis=(1, 2))  # [G*B]
    needs_refine = confidence < conf

    refined = hr_logits_fn(img_crops, ctx_crops)           # [G*B, ch, cw, C]
    sel = jnp.where(needs_refine[:, None, None, None], refined, ctx_crops)
    del g, b
    return accumulate_crops(sel, boxes, (h, w))
