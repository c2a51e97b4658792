"""Dataset indexes: GTAV / Cityscapes / BDD100K / Mapillary / ACDC + the
DG/UDA wrappers with Rare-Class Sampling.

Rebuilds rein/datasets/uda_dataset.py: RCS draws a class from a temperature
softmax over inverted pixel frequencies read from `sample_class_stats.json`
(:16-38), picks a file containing > min_pixels of it from
`samples_with_class.json`, and re-crops up to 10x until the crop carries
min_pixels * min_crop_ratio pixels of the class (:86-97). UDADataset pairs
each source sample with a random target sample (:154-180). All host-side
numpy RNG (SURVEY §7.3).

Dataset path conventions mirror mmseg's dataset classes the reference
configures (SURVEY §2.6); images RGB uint8, labels trainId uint8 (255
ignore).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from vfmseg_tpu.core.registry import DATASETS
from vfmseg_tpu.data.transforms import load_image, load_label

CITYSCAPES_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
)


@DATASETS.register("SegDataset")
class SegDataset:
    """Generic folder-paired segmentation dataset index."""

    def __init__(self, data_root: str, img_dir: str, ann_dir: str,
                 img_suffix: str = ".png", seg_map_suffix: str = ".png",
                 classes: Sequence[str] = CITYSCAPES_CLASSES,
                 ignore_index: int = 255):
        self.data_root = data_root
        self.img_dir = osp.join(data_root, img_dir)
        self.ann_dir = osp.join(data_root, ann_dir)
        self.img_suffix = img_suffix
        self.seg_map_suffix = seg_map_suffix
        self.classes = list(classes)
        self.ignore_index = ignore_index
        self.samples = self._scan()

    def _scan(self) -> List[Dict[str, str]]:
        samples = []
        for root, _dirs, files in sorted(os.walk(self.img_dir)):
            for f in sorted(files):
                if not f.endswith(self.img_suffix):
                    continue
                img_path = osp.join(root, f)
                rel = osp.relpath(img_path, self.img_dir)
                seg_rel = rel[: -len(self.img_suffix)] + self.seg_map_suffix
                seg_path = osp.join(self.ann_dir, seg_rel)
                samples.append({"img_path": img_path, "seg_map_path": seg_path})
        return samples

    def __len__(self):
        return len(self.samples)

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.samples[idx]
        out = {
            "img": load_image(rec["img_path"]),
            "img_path": rec["img_path"],
            "seg_map_path": rec["seg_map_path"],
        }
        if osp.exists(rec["seg_map_path"]):
            out["label"] = load_label(rec["seg_map_path"])
        return out

    __getitem__ = load


@DATASETS.register("CityscapesDataset")
def cityscapes_dataset(data_root: str, img_dir: str = "leftImg8bit/train",
                       ann_dir: str = "gtFine/train", **kw) -> SegDataset:
    return SegDataset(data_root, img_dir, ann_dir,
                      img_suffix="_leftImg8bit.png",
                      seg_map_suffix="_gtFine_labelTrainIds.png", **kw)


@DATASETS.register("GTADataset")
def gta_dataset(data_root: str, img_dir: str = "images",
                ann_dir: str = "labels", **kw) -> SegDataset:
    return SegDataset(data_root, img_dir, ann_dir, img_suffix=".png",
                      seg_map_suffix="_labelTrainIds.png", **kw)


@DATASETS.register("BDD100KDataset")
def bdd100k_dataset(data_root: str, img_dir: str = "images/10k/val",
                    ann_dir: str = "labels/sem_seg/masks/val", **kw) -> SegDataset:
    return SegDataset(data_root, img_dir, ann_dir, img_suffix=".jpg",
                      seg_map_suffix=".png", **kw)


@DATASETS.register("MapillaryDataset")
def mapillary_dataset(data_root: str, img_dir: str = "validation/images",
                      ann_dir: str = "cityscapes_trainIdLabel/val/label",
                      **kw) -> SegDataset:
    return SegDataset(data_root, img_dir, ann_dir, img_suffix=".jpg",
                      seg_map_suffix=".png", **kw)


def rcs_class_probs(data_root: str, temperature: float):
    """Temperature softmax over inverted class pixel frequencies
    (uda_dataset.py:16-38)."""
    with open(osp.join(data_root, "sample_class_stats.json")) as f:
        stats = json.load(f)
    overall: Dict[int, int] = {}
    for s in stats:
        for c, n in s.items():
            if c == "file":
                continue
            overall[int(c)] = overall.get(int(c), 0) + n
    items = sorted(overall.items(), key=lambda kv: kv[1])
    classes = [k for k, _ in items]
    freq = np.array([v for _, v in items], np.float64)
    freq = 1.0 - freq / freq.sum()
    e = np.exp(freq / temperature - np.max(freq / temperature))
    return classes, e / e.sum()


@DATASETS.register("DGDataset")
class DGDataset:
    """Source dataset with Rare-Class Sampling. `pipeline` is applied per
    sample (the crop retry loop re-runs it, matching uda_dataset.py:91-96
    where re-indexing the source re-randomizes the crop)."""

    def __init__(self, source: SegDataset, pipeline: Callable,
                 rare_class_sampling: Optional[dict] = None,
                 seed: int = 0):
        self.source = source
        self.pipeline = pipeline
        self.rng = np.random.default_rng(seed)
        self.rcs_enabled = rare_class_sampling is not None
        if self.rcs_enabled:
            rcs = rare_class_sampling
            self.rcs_min_crop_ratio = rcs.get("min_crop_ratio", 0.5)
            self.rcs_min_pixels = rcs.get("min_pixels", 3000)
            self.rcs_classes, self.rcs_classprob = rcs_class_probs(
                source.data_root, rcs.get("class_temp", 0.01))
            with open(osp.join(source.data_root, "samples_with_class.json")) as f:
                swc = json.load(f)
            self.samples_with_class = {}
            for c in self.rcs_classes:
                files = [
                    file.split("/")[-1]
                    for file, pixels in swc[str(c)]
                    if pixels > self.rcs_min_pixels
                ]
                assert files, f"no samples with enough pixels for class {c}"
                self.samples_with_class[c] = files
            self.file_to_idx = {
                rec["seg_map_path"].split("/")[-1]: i
                for i, rec in enumerate(source.samples)
            }

    def __len__(self):
        return len(self.source)

    def _run_pipeline(self, idx: int) -> Dict[str, np.ndarray]:
        raw = self.source.load(idx)
        return self.pipeline(raw["img"], raw["label"], self.rng)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if not self.rcs_enabled:
            return self._run_pipeline(idx % len(self.source))
        c = int(self.rng.choice(self.rcs_classes, p=self.rcs_classprob))
        f1 = self.rng.choice(self.samples_with_class[c])
        i1 = self.file_to_idx[f1]
        sample = self._run_pipeline(i1)
        if self.rcs_min_crop_ratio > 0:
            for _ in range(10):
                if (sample["label"] == c).sum() > (
                        self.rcs_min_pixels * self.rcs_min_crop_ratio):
                    break
                sample = self._run_pipeline(i1)
        return sample


@DATASETS.register("UDADataset")
class UDADataset(DGDataset):
    """DGDataset + a random unlabeled target sample per item
    (uda_dataset.py:110-186; the reference never wires `self.target` — fixed
    here by taking it as an explicit argument)."""

    def __init__(self, source: SegDataset, target: SegDataset,
                 pipeline: Callable, target_pipeline: Optional[Callable] = None,
                 rare_class_sampling: Optional[dict] = None, seed: int = 0):
        super().__init__(source, pipeline, rare_class_sampling, seed)
        self.target = target
        self.target_pipeline = target_pipeline or pipeline

    def __len__(self):
        return len(self.source) * len(self.target)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        src = super().__getitem__(idx)
        i2 = int(self.rng.integers(len(self.target)))
        raw = self.target.load(i2)
        label = raw.get("label", np.full(raw["img"].shape[:2], 255, np.uint8))
        tgt = self.target_pipeline(raw["img"], label, self.rng)
        return {
            "img": src["img"], "label": src["label"],
            "target_img": tgt["img"],
        }
