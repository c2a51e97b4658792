"""Cityscapes preparation: gtFine labelIds -> trainIds + RCS statistics
(reference tools/convert_datasets/cityscapes.py behavior, without the
cityscapesscripts dependency — the labelId->trainId table is inlined).

Usage: python tools/convert_datasets/cityscapes.py data/cityscapes
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from tools.convert_datasets.gta import ID_TO_TRAINID  # same mapping


def convert_label(path: str):
    label = np.asarray(Image.open(path))
    out = np.full(label.shape[:2], 255, np.uint8)
    stats = {}
    for lid, tid in ID_TO_TRAINID.items():
        mask = label == lid
        n = int(mask.sum())
        if n:
            out[mask] = tid
            stats[str(tid)] = n
    dst = path.replace("_labelIds.png", "_labelTrainIds.png")
    Image.fromarray(out).save(dst)
    stats["file"] = dst
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--gt-dir", default="gtFine/train")
    ap.add_argument("--nproc", type=int, default=8)
    args = ap.parse_args()

    gt_dir = osp.join(args.data_root, args.gt_dir)
    files = sorted(
        osp.join(r, f)
        for r, _d, fs in os.walk(gt_dir)
        for f in fs if f.endswith("_labelIds.png"))
    print(f"converting {len(files)} labels")
    with ProcessPoolExecutor(args.nproc) as ex:
        all_stats = list(ex.map(convert_label, files))

    with open(osp.join(args.data_root, "sample_class_stats.json"), "w") as f:
        json.dump(all_stats, f)
    samples_with_class = {}
    for s in all_stats:
        for c, n in s.items():
            if c == "file":
                continue
            samples_with_class.setdefault(c, []).append([s["file"], n])
    with open(osp.join(args.data_root, "samples_with_class.json"), "w") as f:
        json.dump(samples_with_class, f)
    print("wrote sample_class_stats.json / samples_with_class.json")


if __name__ == "__main__":
    main()
