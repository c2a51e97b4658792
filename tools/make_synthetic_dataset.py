"""Generate a tiny on-disk synthetic dataset in GTA/Cityscapes layout.

Used for end-to-end smoke runs of the train/test CLIs without real data:
writes images/*.png + labels/*_labelTrainIds.png plus the RCS stats files
(sample_class_stats.json / samples_with_class.json) that the reference's
dataset converters emit (tools/convert_datasets/gta.py behavior).

Usage: python tools/make_synthetic_dataset.py /tmp/synth_gta --n 8 --size 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfmseg_tpu.data.synthetic import synthetic_sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    img_dir = os.path.join(args.root, "images")
    lab_dir = os.path.join(args.root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    sample_class_stats = []
    samples_with_class = {}
    for i in range(args.n):
        s = synthetic_sample(rng, (args.size, args.size), args.num_classes)
        name = f"{i:05d}"
        Image.fromarray(s["img"]).save(os.path.join(img_dir, name + ".png"))
        lab_name = name + "_labelTrainIds.png"
        Image.fromarray(s["label"]).save(os.path.join(lab_dir, lab_name))
        stats = {"file": os.path.join(lab_dir, lab_name)}
        for c in np.unique(s["label"]):
            n_pix = int((s["label"] == c).sum())
            stats[str(int(c))] = n_pix
            samples_with_class.setdefault(str(int(c)), []).append(
                [os.path.join(lab_dir, lab_name), n_pix])
        sample_class_stats.append(stats)

    with open(os.path.join(args.root, "sample_class_stats.json"), "w") as f:
        json.dump(sample_class_stats, f)
    with open(os.path.join(args.root, "samples_with_class.json"), "w") as f:
        json.dump(samples_with_class, f)
    print(f"wrote {args.n} samples to {args.root}")


if __name__ == "__main__":
    main()
