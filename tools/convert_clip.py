"""Convert CLIP ViT-L visual towers into the vfmseg_tpu param tree.

Reference behavior (tools/convert_models/convert_clip.py): unwrap the
torch.jit archive and keep visual.* (:27-37), bilinear-resize the pos-embed
grid to (512/16)^2 keeping the cls slot (:39-57), bicubic-resize conv1
14->16 (:59-67). Plus torch->flax mapping: the fused MultiheadAttention
in_proj becomes the qkv kernel, out_proj becomes proj, mlp c_fc/c_proj
become fc1/fc2.

Usage: python tools/convert_clip.py ViT-L-14.pt clip_converted.npz
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.convert_dinov2 import _resize_patch_kernel
from vfmseg_tpu.ops.resize import _apply_separable
from vfmseg_tpu.train.checkpoint import save_pytree


def _resize_pos_bilinear(pos: np.ndarray, target_side: int) -> np.ndarray:
    """CLIP pos embed [(n+1), C] -> [(t^2+1), C], bilinear grid resize."""
    import jax.numpy as jnp

    n = pos.shape[0] - 1
    side = int(round(n**0.5))
    if side == target_side:
        return pos
    grid = jnp.asarray(pos[1:], jnp.float32).reshape(1, side, side, -1)
    grid = _apply_separable(grid, (target_side, target_side), "bilinear",
                            False, (None, None))
    grid = np.asarray(grid).reshape(target_side * target_side, -1)
    return np.concatenate([pos[:1], grid], axis=0)


def convert_clip_state_dict(sd: dict, target_patch: int = 16,
                            target_img: int = 512) -> dict:
    """visual.* state dict (numpy) -> flax `backbone` param tree."""
    sd = {k[len("visual."):]: v for k, v in sd.items()
          if k.startswith("visual.")} or sd
    out: dict = {}

    def put(path: str, value: np.ndarray):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    put("class_embedding", sd["class_embedding"])
    pos = _resize_pos_bilinear(sd["positional_embedding"],
                               target_img // target_patch)
    put("pos_embed", pos[None])  # ours carries a leading batch dim
    pk = _resize_patch_kernel(sd["conv1.weight"], target_patch)
    put("patch_embed/kernel", pk.transpose(2, 3, 1, 0))
    put("ln_pre/scale", sd["ln_pre.weight"])
    put("ln_pre/bias", sd["ln_pre.bias"])

    blk = re.compile(r"^transformer\.resblocks\.(\d+)\.(.+)$")
    for key, val in sd.items():
        m = blk.match(key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        base = f"blocks_{i}"
        mapping = {
            "ln_1.weight": ("norm1/scale", False),
            "ln_1.bias": ("norm1/bias", False),
            "ln_2.weight": ("norm2/scale", False),
            "ln_2.bias": ("norm2/bias", False),
            "attn.in_proj_weight": ("attn/qkv/kernel", True),
            "attn.in_proj_bias": ("attn/qkv/bias", False),
            "attn.out_proj.weight": ("attn/proj/kernel", True),
            "attn.out_proj.bias": ("attn/proj/bias", False),
            "mlp.c_fc.weight": ("mlp/fc1/kernel", True),
            "mlp.c_fc.bias": ("mlp/fc1/bias", False),
            "mlp.c_proj.weight": ("mlp/fc2/kernel", True),
            "mlp.c_proj.bias": ("mlp/fc2/bias", False),
        }
        if rest in mapping:
            fpath, transpose = mapping[rest]
            put(f"{base}/{fpath}", val.T if transpose else val)
    # ln_post / proj (CLIP-embedding head) are only needed when
    # get_embeddings=True, which the segmentation configs disable.
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="CLIP torch.jit archive or state dict")
    ap.add_argument("dst")
    ap.add_argument("--target-patch", type=int, default=16)
    ap.add_argument("--target-img", type=int, default=512)
    args = ap.parse_args()

    import torch

    try:
        sd = torch.jit.load(args.src, map_location="cpu").float().state_dict()
    except RuntimeError:
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    tree = convert_clip_state_dict(sd, args.target_patch, args.target_img)
    save_pytree(args.dst, tree)
    n = sum(v.size for v in np.load(args.dst).values())
    print(f"wrote {args.dst}: {n:,} params")


if __name__ == "__main__":
    main()
