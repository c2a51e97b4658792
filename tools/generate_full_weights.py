"""Merge an adapter/head-only checkpoint with converted backbone weights
into a full segmentor param tree (reference tools/generate_full_weights.py:
36-44 — the offline alternative to LoadBackboneHook).

Usage:
  python tools/generate_full_weights.py \
      --checkpoint work_dirs/run/checkpoints/iter_0040000.trainable.npz \
      --backbone checkpoints/dinov2_converted.npz \
      --out full_weights.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfmseg_tpu.train.checkpoint import load_pytree, save_pytree
from vfmseg_tpu.train.optim import merge_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="trainable-partition checkpoint (.npz, 't' tree)")
    ap.add_argument("--backbone", required=True,
                    help="converted backbone weights (.npz)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    trainable = load_pytree(args.checkpoint)
    trainable = trainable.get("t", trainable)
    backbone = load_pytree(args.backbone)
    # DomainGeneral checkpoints nest the segmentor under "model/"
    from vfmseg_tpu.train.optim import nest_under, resolve_backbone_prefix

    prefix = resolve_backbone_prefix(trainable) if trainable else ("backbone",)
    full = merge_params(trainable, nest_under(prefix, backbone))
    save_pytree(args.out, full)
    n = sum(v.size for v in np.load(args.out).values())
    print(f"wrote {args.out}: {n:,} params")


if __name__ == "__main__":
    main()
