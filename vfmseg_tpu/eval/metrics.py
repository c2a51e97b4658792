"""Per-dataset mIoU evaluation.

Rebuilds DGIoUMetric (rein/dg_metrics.py): streaming per-image
intersect/union accumulation grouped by a dataset key (matched by substring
of the GT path, :52-58), per-dataset IoU/Acc tables and a ``mean_mIoU`` over
``mean_used_keys`` (:74-102).

TPU design (SURVEY §5.5): the per-image intersect/union reduction is a jitted
one-hot bincount on device; only [num_classes]-sized vectors come back to the
host accumulator.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def intersect_and_union(pred: jax.Array, label: jax.Array, num_classes: int,
                        ignore_index: int = 255):
    """Per-class (intersect, union, pred_area, label_area), each [num_classes].

    pred/label: integer class maps of identical shape (any rank).
    """
    valid = label != ignore_index
    pred = jnp.where(valid, pred, num_classes)
    label = jnp.where(valid, label, num_classes)

    def _hist(x):
        onehot = jax.nn.one_hot(x.reshape(-1), num_classes + 1, dtype=jnp.float32)
        return jnp.sum(onehot, axis=0)[:num_classes]

    inter = _hist(jnp.where(pred == label, pred, num_classes))
    area_pred = _hist(pred)
    area_label = _hist(label)
    union = area_pred + area_label - inter
    return inter, union, area_pred, area_label


class IoUAccumulator:
    """Host-side streaming accumulator with dataset-key grouping."""

    def __init__(self, num_classes: int = 19,
                 dataset_keys: Optional[Sequence[str]] = None,
                 mean_used_keys: Optional[Sequence[str]] = None,
                 class_names: Optional[Sequence[str]] = None,
                 ignore_index: int = 255):
        self.num_classes = num_classes
        self.dataset_keys = list(dataset_keys or [])
        self.mean_used_keys = list(mean_used_keys or self.dataset_keys)
        self.class_names = list(class_names or [str(i) for i in range(num_classes)])
        self.ignore_index = ignore_index
        self._acc: Dict[str, np.ndarray] = {}

    def _key_for(self, path: str) -> str:
        for key in self.dataset_keys:
            if key in path:
                return key
        return "default"

    def update(self, pred, label, path: str = ""):
        if label is None:
            # unannotated split (predictions-only export, e.g. --show-dir on
            # a test set without ground truth) — nothing to accumulate
            return
        inter, union, apred, alabel = intersect_and_union(
            jnp.asarray(pred), jnp.asarray(label), self.num_classes,
            self.ignore_index)
        key = self._key_for(path)
        stats = np.stack([np.asarray(inter), np.asarray(union),
                          np.asarray(apred), np.asarray(alabel)])
        if key in self._acc:
            self._acc[key] += stats
        else:
            self._acc[key] = stats

    def compute(self) -> Dict[str, float]:
        """Returns {"<key>_mIoU": ..., "mean_mIoU": ...} like dg_metrics.py:74-102."""
        results: Dict[str, float] = {}
        per_key_miou: List[float] = []
        for key, stats in self._acc.items():
            inter, union, apred, alabel = stats
            iou = np.where(union > 0, inter / np.maximum(union, 1e-12), np.nan)
            acc = np.where(alabel > 0, inter / np.maximum(alabel, 1e-12), np.nan)
            miou = float(np.nanmean(iou) * 100.0)
            results[f"{key}_mIoU"] = round(miou, 2)
            results[f"{key}_aAcc"] = round(
                float(inter.sum() / max(alabel.sum(), 1e-12) * 100.0), 2)
            del acc
            if not self.mean_used_keys or key in self.mean_used_keys:
                per_key_miou.append(miou)
        if per_key_miou:
            results["mean_mIoU"] = round(float(np.mean(per_key_miou)), 2)
        return results

    def per_class_iou(self, key: str = "default") -> Dict[str, float]:
        inter, union, _, _ = self._acc[key]
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), np.nan)
        return {name: round(float(v * 100.0), 2)
                for name, v in zip(self.class_names, iou)}


CITYSCAPES_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
)
