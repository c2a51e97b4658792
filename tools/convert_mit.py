"""Convert SegFormer MiT (mit_b0..b5) torch checkpoints into the vfmseg_tpu
param tree.

The reference's DAFormer model bases load mmseg's pretrained mit_b5
(`pretrained/mit_b5.pth`, configs/_base_/models/daformer_conv1_mitb5.py:15);
this maps the official-SegFormer/mmseg state_dict layout
(patch_embed{i}.proj/norm, block{i}.{j}.{norm1,attn.{q,kv,proj,sr,norm},
norm2,mlp.{fc1,dwconv.dwconv,fc2}}, norm{i}) onto
vfmseg_tpu.models.backbones.mit.MixVisionTransformer.

Usage:
  python tools/convert_mit.py mit_b5.pth mit_b5_converted.npz
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfmseg_tpu.train.checkpoint import save_pytree  # noqa: E402


def _linear(w):
    return np.asarray(w).T                      # [out, in] -> [in, out]


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _dwconv(w):
    # torch depthwise [C, 1, kh, kw] -> flax grouped-conv HWIO [kh, kw, 1, C]
    return np.asarray(w).transpose(2, 3, 1, 0)


def convert(state: dict) -> dict:
    out: dict = {}

    def put(path: str, arr):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(arr, np.float32)

    def ln(dst, src):
        put(f"{dst}/scale", state[f"{src}.weight"])
        put(f"{dst}/bias", state[f"{src}.bias"])

    def dense(dst, src):
        put(f"{dst}/kernel", _linear(state[f"{src}.weight"]))
        put(f"{dst}/bias", state[f"{src}.bias"])

    for i in range(1, 5):
        put(f"patch_embed{i}/kernel", _conv(state[f"patch_embed{i}.proj.weight"]))
        put(f"patch_embed{i}/bias", state[f"patch_embed{i}.proj.bias"])
        ln(f"embed_norm{i}", f"patch_embed{i}.norm")
        ln(f"norm{i}", f"norm{i}")
        depth = 1 + max(
            int(m.group(1))
            for k in state
            if (m := re.match(rf"block{i}\.(\d+)\.", k)))
        for j in range(depth):
            src = f"block{i}.{j}"
            dst = f"stage{i}_block{j}"
            ln(f"{dst}/norm1", f"{src}.norm1")
            ln(f"{dst}/norm2", f"{src}.norm2")
            dense(f"{dst}/attn/q", f"{src}.attn.q")
            dense(f"{dst}/attn/kv", f"{src}.attn.kv")
            dense(f"{dst}/attn/proj", f"{src}.attn.proj")
            if f"{src}.attn.sr.weight" in state:
                put(f"{dst}/attn/sr/kernel", _conv(state[f"{src}.attn.sr.weight"]))
                put(f"{dst}/attn/sr/bias", state[f"{src}.attn.sr.bias"])
                ln(f"{dst}/attn/sr_norm", f"{src}.attn.norm")
            dense(f"{dst}/mlp/fc1", f"{src}.mlp.fc1")
            put(f"{dst}/mlp/dwconv/kernel",
                _dwconv(state[f"{src}.mlp.dwconv.dwconv.weight"]))
            put(f"{dst}/mlp/dwconv/bias", state[f"{src}.mlp.dwconv.dwconv.bias"])
            dense(f"{dst}/mlp/fc2", f"{src}.mlp.fc2")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="mit_bN.pth (torch state dict)")
    ap.add_argument("dst", help="output .npz param tree")
    args = ap.parse_args()

    import torch

    state = torch.load(args.src, map_location="cpu")
    if "state_dict" in state:
        state = state["state_dict"]
    state = {k: v.numpy() for k, v in state.items()
             if not k.startswith("head.")}
    tree = convert(state)
    save_pytree(args.dst, tree)
    n = sum(v.size for v in state.values())
    print(f"wrote {args.dst}: {n:,} params")


if __name__ == "__main__":
    main()
