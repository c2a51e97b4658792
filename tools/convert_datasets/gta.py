"""GTA5 dataset preparation: labelId -> trainId maps + RCS statistics.

Rebuilds tools/convert_datasets/gta.py behavior: writes
*_labelTrainIds.png next to each label, plus sample_class_stats.json /
samples_with_class.json consumed by rare-class sampling
(rein/datasets/uda_dataset.py:16-38,63-78).

Usage: python tools/convert_datasets/gta.py data/gta [--nproc 8]
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

# GTA ships cityscapes labelIds; standard labelId -> trainId mapping
ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


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
    dst = path.replace(".png", "_labelTrainIds.png")
    Image.fromarray(out).save(dst)
    stats["file"] = dst
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--label-dir", default="labels")
    ap.add_argument("--nproc", type=int, default=8)
    args = ap.parse_args()

    label_dir = osp.join(args.data_root, args.label_dir)
    files = sorted(
        osp.join(r, f)
        for r, _d, fs in os.walk(label_dir)
        for f in fs
        if f.endswith(".png") and not f.endswith("_labelTrainIds.png"))
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
