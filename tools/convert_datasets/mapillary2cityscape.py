"""Mapillary Vistas -> cityscapes trainId labels (reference
tools/convert_datasets/mapillary2cityscape.py behavior).

Maps the 66 Vistas v1.2 classes onto the 19 cityscapes train classes;
everything else becomes 255 (ignore).

Usage:
  python tools/convert_datasets/mapillary2cityscape.py data/mapillary \
      validation/labels cityscapes_trainIdLabel/val/label
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from PIL import Image

# Vistas v1.2 label index -> cityscapes trainId
VISTAS_TO_CITYSCAPES = {
    13: 0, 24: 0, 41: 0,          # road-ish
    2: 1, 15: 1,                  # sidewalk
    17: 2,                        # building
    6: 3,                         # wall
    3: 4,                         # fence
    45: 5, 47: 5,                 # pole
    48: 6,                        # traffic light
    50: 7,                        # traffic sign
    30: 8,                        # vegetation
    29: 9,                        # terrain
    27: 10,                       # sky
    19: 11,                       # person
    20: 12, 21: 12, 22: 12,       # rider
    55: 13,                       # car
    61: 14,                       # truck
    54: 15,                       # bus
    58: 16,                       # train
    57: 17,                       # motorcycle
    52: 18,                       # bicycle
}


def convert_one(src_dst):
    src, dst = src_dst
    label = np.asarray(Image.open(src))
    if label.ndim == 3:
        label = label[..., 0]
    out = np.full(label.shape, 255, np.uint8)
    for vid, tid in VISTAS_TO_CITYSCAPES.items():
        out[label == vid] = tid
    os.makedirs(osp.dirname(dst), exist_ok=True)
    Image.fromarray(out).save(dst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("label_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--nproc", type=int, default=8)
    args = ap.parse_args()

    src_dir = osp.join(args.data_root, args.label_dir)
    out_dir = osp.join(args.data_root, args.out_dir)
    jobs = []
    for r, _d, fs in os.walk(src_dir):
        for f in sorted(fs):
            if f.endswith(".png"):
                src = osp.join(r, f)
                dst = osp.join(out_dir, osp.relpath(src, src_dir))
                jobs.append((src, dst))
    print(f"converting {len(jobs)} labels")
    with ProcessPoolExecutor(args.nproc) as ex:
        list(ex.map(convert_one, jobs))
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
