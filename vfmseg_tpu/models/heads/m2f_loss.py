"""Mask2Former set-prediction loss (Hungarian matching + point-sampled
mask/dice losses).

Rebuilds the mmdet loss stack the reference configures
(configs/_base_/models/rein_dinov2_mask2former.py:125-161):
  * HungarianAssigner with ClassificationCost(2.0) +
    CrossEntropyLossCost(5.0, sigmoid) + DiceCost(5.0, naive, eps=1)
    over `num_points` uniformly sampled points
  * loss_cls: CE over queries with class_weight [1]*K + [0.1] for no-object
  * loss_mask: sigmoid BCE on uncertainty-sampled points (12544 points,
    oversample 3.0, importance 0.75)
  * loss_dice: naive dice on the same points
  * every decoder stage (initial + 9) is supervised

TPU design: semantic GT becomes a FIXED-size instance set (one slot per
class, `exists` flags), so the Hungarian problem is a static [Nq, K] matrix;
dummy columns carry a constant cost and cannot disturb real assignments.
All stages' matchings run in ONE host callback (scipy linear_sum_assignment
on tiny matrices); everything else stays on device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DUMMY_COST = 1e6


def semantic_to_targets(labels: jax.Array, num_classes: int,
                        ignore_index: int = 255):
    """[B, H, W] semantic labels -> per-class binary masks + exists flags.

    Returns gt_masks [B, K, H, W] (float), exists [B, K] (bool); slot k is
    class k (mmseg's semantic->instance conversion keeps one mask per
    present class)."""
    onehot = (labels[:, None, :, :] == jnp.arange(num_classes)[None, :, None, None])
    valid = (labels != ignore_index)[:, None]
    gt_masks = (onehot & valid).astype(jnp.float32)
    exists = jnp.sum(gt_masks, axis=(2, 3)) > 0
    return gt_masks, exists


def _sample_points(maps: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear point sampling. maps: [..., H, W]; coords: [P, 2] (x, y) in
    [0, 1] (grid_sample align_corners=False). Returns [..., P]."""
    from vfmseg_tpu.ops.deform_attn import bilinear_sample_nhwc

    lead = maps.shape[:-2]
    h, w = maps.shape[-2:]
    flat = maps.reshape(-1, h, w, 1)
    loc = jnp.broadcast_to(coords[None], (flat.shape[0],) + coords.shape)
    out = bilinear_sample_nhwc(flat, loc)[..., 0]
    return out.reshape(*lead, coords.shape[0])


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    """cost: [N, Nq, K] -> assigned query index per gt [N, K]."""
    from scipy.optimize import linear_sum_assignment

    cost = np.nan_to_num(np.asarray(cost, np.float64), nan=_DUMMY_COST,
                         posinf=_DUMMY_COST, neginf=-_DUMMY_COST)
    n, nq, k = cost.shape
    out = np.zeros((n, k), np.int32)
    for i in range(n):
        rows, cols = linear_sum_assignment(cost[i])
        out[i, cols] = rows.astype(np.int32)
    return out


@jax.custom_jvp
def hungarian_match(cost: jax.Array) -> jax.Array:
    """[N, Nq, K] -> [N, K] assigned query per gt (host scipy callback).
    Non-differentiable (the assignment is piecewise constant)."""
    n, _nq, k = cost.shape
    return jax.pure_callback(
        _hungarian_host, jax.ShapeDtypeStruct((n, k), jnp.int32), cost)


@hungarian_match.defjvp
def _hungarian_match_jvp(primals, tangents):
    del tangents
    out = hungarian_match(primals[0])
    return out, np.zeros(out.shape, dtype=jax.dtypes.float0)


def _match_cost(cls_pred, mask_pred, gt_masks, exists, coords,
                cls_weight=2.0, mask_weight=5.0, dice_weight=5.0):
    """Per-sample cost matrix [Nq, K] at sampled points (mmdet costs)."""
    num_classes = gt_masks.shape[0]
    p = coords.shape[0]
    probs = jax.nn.softmax(cls_pred.astype(jnp.float32), axis=-1)
    cls_cost = -probs[:, :num_classes]  # [Nq, K(=classes)]

    pred_pts = _sample_points(mask_pred.astype(jnp.float32), coords)  # [Nq, P]
    gt_pts = _sample_points(gt_masks, coords)                          # [K, P]
    pos = jax.nn.softplus(-pred_pts)   # BCE(pred, 1)
    neg = jax.nn.softplus(pred_pts)    # BCE(pred, 0)
    mask_cost = (pos @ gt_pts.T + neg @ (1.0 - gt_pts).T) / p

    sig = jax.nn.sigmoid(pred_pts)
    numer = 2.0 * (sig @ gt_pts.T)
    denom = sig.sum(-1)[:, None] + gt_pts.sum(-1)[None, :]
    dice_cost = 1.0 - (numer + 1.0) / (denom + 1.0)

    cost = cls_weight * cls_cost + mask_weight * mask_cost + dice_weight * dice_cost
    return jnp.where(exists[None, :], cost, _DUMMY_COST)


def _sample_points_per(maps: jax.Array, coords: jax.Array) -> jax.Array:
    """Per-item bilinear sampling. maps: [N, H, W]; coords: [N, P, 2] (x, y)
    in [0, 1]. Returns [N, P]."""
    from vfmseg_tpu.ops.deform_attn import bilinear_sample_nhwc

    return bilinear_sample_nhwc(maps[..., None], coords)[..., 0]


def _uncertain_points(mask_logits: jax.Array, rng, num_points: int,
                      oversample: float, importance: float) -> jax.Array:
    """Per-MASK uncertainty point coords [B, K, P, 2] (mmdet
    get_uncertain_point_coords_with_randomness: each matched mask draws its
    own oversampled pool, keeps its own most-uncertain importance fraction
    (uncertainty = -|logit| of that mask), pads with fresh uniform points)."""
    b, k = mask_logits.shape[:2]
    hw = mask_logits.shape[2:]
    n_sampled = int(num_points * oversample)
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (b * k, n_sampled, 2))
    pts = _sample_points_per(
        mask_logits.astype(jnp.float32).reshape(b * k, *hw), coords)
    unc = -jnp.abs(pts)                       # [B*K, n_sampled]
    n_unc = int(importance * num_points)
    top_idx = jax.lax.top_k(unc, n_unc)[1]    # [B*K, n_unc]
    top = jnp.take_along_axis(coords, top_idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (b * k, num_points - n_unc, 2))
    return jnp.concatenate([top, rand], axis=1).reshape(b, k, num_points, 2)


def mask2former_loss(
    cls_preds: List[jax.Array],
    mask_preds: List[jax.Array],
    labels: jax.Array,
    rng: jax.Array,
    *,
    num_classes: int = 19,
    num_points: int = 12544,
    oversample: float = 3.0,
    importance: float = 0.75,
    cls_loss_weight: float = 2.0,
    mask_loss_weight: float = 5.0,
    dice_loss_weight: float = 5.0,
    bg_class_weight: float = 0.1,
    ignore_index: int = 255,
) -> Dict[str, jax.Array]:
    """Full multi-stage loss. labels: [B, H, W] (may be full-res; masks are
    compared at mask_pred resolution via point sampling in [0,1] coords)."""
    b = labels.shape[0]
    num_stages = len(cls_preds)
    nq = cls_preds[0].shape[1]
    gt_masks, exists = semantic_to_targets(labels, num_classes, ignore_index)

    # ---- matching for all stages in one host callback ------------------
    match_rng, pt_rng = jax.random.split(rng)
    match_coords = jax.random.uniform(match_rng, (num_points, 2))
    costs = []
    for s in range(num_stages):
        costs.append(jax.vmap(
            functools.partial(_match_cost, coords=match_coords,
                              cls_weight=cls_loss_weight,
                              mask_weight=mask_loss_weight,
                              dice_weight=dice_loss_weight)
        )(cls_preds[s], mask_preds[s], gt_masks, exists))
    all_costs = jnp.stack(costs).reshape(num_stages * b, nq, num_classes)
    assigned = hungarian_match(all_costs).reshape(num_stages, b, num_classes)

    num_total = jnp.maximum(jnp.sum(exists.astype(jnp.float32)), 1.0)
    class_weight = jnp.concatenate(
        [jnp.ones(num_classes), jnp.array([bg_class_weight])])

    losses: Dict[str, jax.Array] = {}
    for s in range(num_stages):
        cls_pred = cls_preds[s].astype(jnp.float32)   # [B, Nq, C+1]
        mask_pred = mask_preds[s].astype(jnp.float32)  # [B, Nq, h, w]
        assign = assigned[s]                           # [B, K] query per gt

        # labels per query: matched & exists -> class, else bg
        q_labels = jnp.full((b, nq), num_classes, jnp.int32)
        batch_idx = jnp.arange(b)[:, None]
        cls_ids = jnp.broadcast_to(jnp.arange(num_classes)[None], (b, num_classes))
        q_labels = q_labels.at[batch_idx, assign].set(
            jnp.where(exists, cls_ids, num_classes))

        logp = jax.nn.log_softmax(cls_pred, axis=-1)
        nll = -jnp.take_along_axis(logp, q_labels[..., None], axis=-1)[..., 0]
        w = class_weight[q_labels]
        # mmdet: weighted CE / sum of class weights of targets
        loss_cls = cls_loss_weight * jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

        # gather matched predictions per gt slot
        matched = jnp.take_along_axis(
            mask_pred, assign[..., None, None], axis=1)  # [B, K, h, w]
        hw = matched.shape[2:]
        coords = _uncertain_points(
            matched, jax.random.fold_in(pt_rng, s), num_points, oversample,
            importance)                                  # [B, K, P, 2]
        flat_coords = coords.reshape(b * num_classes, num_points, 2)
        pred_pts = _sample_points_per(
            matched.reshape(b * num_classes, *hw), flat_coords
        ).reshape(b, num_classes, num_points)
        gt_hw = gt_masks.shape[2:]
        gt_pts = _sample_points_per(
            gt_masks.reshape(b * num_classes, *gt_hw), flat_coords
        ).reshape(b, num_classes, num_points)

        e = exists.astype(jnp.float32)[..., None]
        bce = jax.nn.softplus(pred_pts) - pred_pts * gt_pts  # BCE-with-logits
        loss_mask = mask_loss_weight * jnp.sum(bce * e) / (num_total * num_points)

        sig = jax.nn.sigmoid(pred_pts)
        numer = 2.0 * jnp.sum(sig * gt_pts, axis=-1)
        denom = jnp.sum(sig, axis=-1) + jnp.sum(gt_pts, axis=-1)
        dice = 1.0 - (numer + 1.0) / (denom + 1.0)
        loss_dice = dice_loss_weight * jnp.sum(dice * e[..., 0]) / num_total

        prefix = "" if s == num_stages - 1 else f"d{s}."
        losses[f"{prefix}loss_cls"] = loss_cls
        losses[f"{prefix}loss_mask"] = loss_mask
        losses[f"{prefix}loss_dice"] = loss_dice
    return losses
