"""Convert EVA02-L torch checkpoints into the vfmseg_tpu param tree.

Reference behavior (tools/convert_models/convert_eva2_512x512.py): drop
rope.* buffers (:100-106 — RoPE tables are rebuilt per input size), resize
patch-embed conv 14->16 (:109-115), resize pos-embed grid to (512/16)^2
(:6-71). Plus torch->flax layout mapping. EVA02 quirks handled:
  * split q/k/v projections; q_bias/v_bias are separate parameters and k has
    no bias (eva_02.py:271-283,336-346)
  * SwiGLU mlp.w1/w2/ffn_ln/w3
  * no LayerScale in the EVA02-L config (init_values=None)

Usage:
  python tools/convert_eva2.py eva02_L_pt_m38m_p14.pt eva02_converted.npz
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.convert_dinov2 import _resize_patch_kernel, _resize_pos_embed
from vfmseg_tpu.train.checkpoint import save_pytree


def convert_eva02_state_dict(sd: dict, target_patch: int = 16,
                             target_img: int = 512) -> dict:
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
    put("patch_embed/kernel", pk.transpose(2, 3, 1, 0))
    put("patch_embed/bias", sd["patch_embed.proj.bias"])

    blk = re.compile(r"^blocks\.(\d+)\.(.+)$")
    for key, val in sd.items():
        m = blk.match(key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        base = f"blocks_{i}"
        if rest.startswith("attn.rope") or rest.startswith("rope"):
            continue  # rope tables are rebuilt per input size
        mapping = {
            "norm1.weight": ("norm1/scale", False),
            "norm1.bias": ("norm1/bias", False),
            "norm2.weight": ("norm2/scale", False),
            "norm2.bias": ("norm2/bias", False),
            "attn.q_proj.weight": ("attn/q_proj/kernel", True),
            "attn.k_proj.weight": ("attn/k_proj/kernel", True),
            "attn.v_proj.weight": ("attn/v_proj/kernel", True),
            "attn.q_bias": ("attn/q_proj/bias", False),
            "attn.v_bias": ("attn/v_proj/bias", False),
            "attn.proj.weight": ("attn/proj/kernel", True),
            "attn.proj.bias": ("attn/proj/bias", False),
            "mlp.w1.weight": ("mlp/w1/kernel", True),
            "mlp.w1.bias": ("mlp/w1/bias", False),
            "mlp.w2.weight": ("mlp/w2/kernel", True),
            "mlp.w2.bias": ("mlp/w2/bias", False),
            "mlp.w3.weight": ("mlp/w3/kernel", True),
            "mlp.w3.bias": ("mlp/w3/bias", False),
            "mlp.ffn_ln.weight": ("mlp/ffn_ln/scale", False),
            "mlp.ffn_ln.bias": ("mlp/ffn_ln/bias", False),
            "gamma_1": ("ls1/gamma", False),
            "gamma_2": ("ls2/gamma", False),
        }
        if rest in mapping:
            fpath, transpose = mapping[rest]
            put(f"{base}/{fpath}", val.T if transpose else val)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--target-patch", type=int, default=16)
    ap.add_argument("--target-img", type=int, default=512)
    args = ap.parse_args()

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    for key in ("state_dict", "module", "model"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    tree = convert_eva02_state_dict(sd, args.target_patch, args.target_img)
    save_pytree(args.dst, tree)
    n = sum(v.size for v in np.load(args.dst).values())
    print(f"wrote {args.dst}: {n:,} params")


if __name__ == "__main__":
    main()
