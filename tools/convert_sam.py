"""Convert SAM ViT-H checkpoints into the vfmseg_tpu param tree.

Reference behavior (tools/convert_models/convert_sam.py): select
image_encoder.* (:22-37), resize the 4D pos-embed grid to 512/16 = 32^2
(:52-72). Relative-position tables are kept at their pretrain length (the
model resizes them at runtime, sam_vit.py:360-390). Plus torch->flax layout
mapping (mlp lin1/lin2 -> fc1/fc2).

Usage: python tools/convert_sam.py sam_vit_h_4b8939.pth sam_converted.npz
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfmseg_tpu.ops.resize import _apply_separable
from vfmseg_tpu.train.checkpoint import save_pytree


def _resize_pos_2d(pos: np.ndarray, target_side: int) -> np.ndarray:
    """[1, s, s, C] -> [1, t, t, C] bicubic (reference uses interpolate on
    the permuted grid)."""
    import jax.numpy as jnp

    if pos.shape[1] == target_side:
        return pos
    out = _apply_separable(jnp.asarray(pos, jnp.float32),
                           (target_side, target_side), "bicubic", False,
                           (None, None))
    return np.asarray(out)


def convert_sam_state_dict(sd: dict, target_img: int = 512,
                           patch_size: int = 16) -> dict:
    sd = {k[len("image_encoder."):]: v for k, v in sd.items()
          if k.startswith("image_encoder.")} or sd
    out: dict = {}

    def put(path: str, value: np.ndarray):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    put("pos_embed", _resize_pos_2d(sd["pos_embed"], target_img // patch_size))
    put("patch_embed/kernel", sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put("patch_embed/bias", sd["patch_embed.proj.bias"])

    blk = re.compile(r"^blocks\.(\d+)\.(.+)$")
    for key, val in sd.items():
        m = blk.match(key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        base = f"blocks_{i}"
        mapping = {
            "norm1.weight": ("norm1/scale", False),
            "norm1.bias": ("norm1/bias", False),
            "norm2.weight": ("norm2/scale", False),
            "norm2.bias": ("norm2/bias", False),
            "attn.qkv.weight": ("attn/qkv/kernel", True),
            "attn.qkv.bias": ("attn/qkv/bias", False),
            "attn.proj.weight": ("attn/proj/kernel", True),
            "attn.proj.bias": ("attn/proj/bias", False),
            "attn.rel_pos_h": ("attn/rel_pos_h", False),
            "attn.rel_pos_w": ("attn/rel_pos_w", False),
            "mlp.lin1.weight": ("mlp/fc1/kernel", True),
            "mlp.lin1.bias": ("mlp/fc1/bias", False),
            "mlp.lin2.weight": ("mlp/fc2/kernel", True),
            "mlp.lin2.bias": ("mlp/fc2/bias", False),
        }
        if rest in mapping:
            fpath, transpose = mapping[rest]
            put(f"{base}/{fpath}", val.T if transpose else val)
    # neck.* (SAM's 256-ch output convs) is not part of the seg backbone
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--target-img", type=int, default=512)
    args = ap.parse_args()

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    tree = convert_sam_state_dict(sd, args.target_img)
    save_pytree(args.dst, tree)
    n = sum(v.size for v in np.load(args.dst).values())
    print(f"wrote {args.dst}: {n:,} params")


if __name__ == "__main__":
    main()
