"""Convert DINOv2 ViT-L/14 torch checkpoints into the vfmseg_tpu param tree.

Reference behavior (tools/convert_models/convert_dinov2.py): bicubic-resize
the patch-embed conv kernel 14->16 (:33-43) and the position-embedding grid
to (512/16)^2 = 32x32 keeping the cls token (:46-68). On top of that this
tool maps torch layouts to flax (linear weights transpose, conv kernels
OIHW->HWIO) and emits the `backbone` subtree consumed by
tools/train.py --backbone-init / tools/test.py --backbone.

Usage:
  python tools/convert_dinov2.py dinov2_vitl14_pretrain.pth \
      dinov2_converted.npz [--target-patch 16] [--target-img 512]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfmseg_tpu.ops.resize import _apply_separable  # torch-parity bicubic
from vfmseg_tpu.train.checkpoint import save_pytree


def _resize_patch_kernel(w: np.ndarray, target: int) -> np.ndarray:
    """torch [C_out, 3, p, p] -> bicubic to [C_out, 3, t, t] (reference :33-43)."""
    import jax.numpy as jnp

    if w.shape[-1] == target:
        return w
    x = jnp.asarray(w, jnp.float32).transpose(0, 2, 3, 1)  # [O, p, p, I]
    x = _apply_separable(x, (target, target), "bicubic", False, (None, None))
    return np.asarray(x.transpose(0, 3, 1, 2))


def _resize_pos_embed(pos: np.ndarray, target_side: int,
                      num_prefix: int = 1) -> np.ndarray:
    """[1, 1+N, C] -> [1, 1+target^2, C] bicubic on the grid part (:46-68)."""
    import jax.numpy as jnp

    n = pos.shape[1] - num_prefix
    side = int(round(n**0.5))
    if side == target_side:
        return pos
    prefix, grid = pos[:, :num_prefix], pos[:, num_prefix:]
    grid = jnp.asarray(grid, jnp.float32).reshape(1, side, side, pos.shape[-1])
    grid = _apply_separable(grid, (target_side, target_side), "bicubic", False,
                            (None, None))
    grid = np.asarray(grid).reshape(1, target_side * target_side, pos.shape[-1])
    return np.concatenate([prefix, grid], axis=1)


def convert_dinov2_state_dict(sd: dict, target_patch: int = 16,
                              target_img: int = 512) -> dict:
    """torch DINOv2 state_dict (numpy values) -> flax `backbone` param tree."""
    out: dict = {}

    def put(path: str, value: np.ndarray):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    put("cls_token", sd["cls_token"])
    put("pos_embed",
        _resize_pos_embed(sd["pos_embed"], target_img // target_patch))
    pk = _resize_patch_kernel(sd["patch_embed.proj.weight"], target_patch)
    put("patch_embed/kernel", pk.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    put("patch_embed/bias", sd["patch_embed.proj.bias"])

    blk = re.compile(r"^blocks\.(\d+)\.(.+)$")
    linear_map = {
        "attn.qkv": "attn/qkv", "attn.proj": "attn/proj",
        "mlp.fc1": "mlp/fc1", "mlp.fc2": "mlp/fc2",
        "mlp.w12": "mlp/w12", "mlp.w3": "mlp/w3",
    }
    for key, val in sd.items():
        m = blk.match(key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        base = f"blocks_{i}"
        if rest in ("norm1.weight", "norm2.weight"):
            put(f"{base}/{rest.split('.')[0]}/scale", val)
        elif rest in ("norm1.bias", "norm2.bias"):
            put(f"{base}/{rest.split('.')[0]}/bias", val)
        elif rest in ("ls1.gamma", "ls2.gamma"):
            put(f"{base}/{rest.split('.')[0]}/gamma", val)
        else:
            for tname, fname in linear_map.items():
                if rest == f"{tname}.weight":
                    put(f"{base}/{fname}/kernel", val.T)
                elif rest == f"{tname}.bias":
                    put(f"{base}/{fname}/bias", val)
    # norm.weight/bias (final norm) unused: DINOv2 features are pre-norm
    # (dino_v2.py forward_features); mask_token intentionally dropped.
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="torch .pth checkpoint")
    ap.add_argument("dst", help="output .npz param tree")
    ap.add_argument("--target-patch", type=int, default=16)
    ap.add_argument("--target-img", type=int, default=512)
    args = ap.parse_args()

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    tree = convert_dinov2_state_dict(sd, args.target_patch, args.target_img)
    save_pytree(args.dst, tree)
    n = sum(v.size for v in np.load(args.dst).values())
    print(f"wrote {args.dst}: {n:,} params")


if __name__ == "__main__":
    main()
