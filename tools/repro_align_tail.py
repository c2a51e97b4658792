"""Validate the aligned-tail flash modes inside the full ViT-L refine graph.

The aligned-tail split removes the 12.4% lane padding at refine length
1025. The original XLA-einsum formulation (now VFMSEG_FLASH_ALIGN_TAIL=xla)
hard-crashed the TPU worker when XLA fused the tail einsums/concat around
the pallas_call at specific batch sizes (b=26); the in-kernel VPU
side-chain (mode "auto"/"1", see _fwd_kernel_qkv_tav) removes that fusion
surface and passes at every bucket size. This script runs the LoRA-DINOv2
ViT-L backbone at the refine-bucket batch sizes:

    python tools/repro_align_tail.py [--sizes 22 24 26 28] [--time]

Set VFMSEG_FLASH_ALIGN_TAIL before launching to pick the mode (the flash
module reads it at trace time); default is "auto".
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
os.environ.setdefault("VFMSEG_GELU_APPROX", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[22, 24, 26, 28])
    ap.add_argument("--time", action="store_true",
                    help="also time the backbone at each size (8 chained)")
    ap.add_argument("--config", default="dg_lora_dinov2_ms_masked",
                    help="model config (e.g. dg_lora_eva02_ms_masked to "
                         "hunt the EVA02 head-major fault)")
    args = ap.parse_args()

    from bench import random_variables
    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.models.build import build_segmentor
    from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor

    dtype = jnp.bfloat16
    cfg = load_config(args.config)
    model = build_segmentor(cfg.model, dtype=dtype, attn_impl="auto")
    ih, iw = tuple(cfg.get("crop_size", (1024, 1024)))
    variables = random_variables(
        model, jnp.zeros((1, ih, iw, 3), dtype),
        jnp.zeros((1, ih, iw), jnp.int32))

    @jax.jit
    def feats(v, x):
        return model.apply(v, x, False, method=MsVFMSegmentor._feats)[-1]

    mode = os.environ.get("VFMSEG_FLASH_ALIGN_TAIL", "auto")
    print(json.dumps({"align_tail_mode": mode}), flush=True)
    for b in args.sizes:
        x = jax.random.normal(jax.random.PRNGKey(b), (b, 512, 512, 3), dtype)
        t0 = time.time()
        out = np.asarray(feats(variables, x))
        dt = time.time() - t0
        row = {"b": b, "ok": bool(np.isfinite(out).all()),
               "mean": float(np.mean(np.abs(out.astype(np.float32)))),
               "first_call_s": round(dt, 2)}
        if args.time:
            r = jnp.float32(0.0)

            @jax.jit
            def chain(v, x, acc):
                return jnp.sum(feats(v, x + (acc * 1e-12).astype(x.dtype))
                               [:, ::7, ::7, ::97]).astype(jnp.float32)

            float(chain(variables, x, r))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                acc = r
                for _ in range(6):
                    acc = chain(variables, x, acc)
                float(acc)
                best = min(best, (time.time() - t0) / 6)
            row["ms"] = round(best * 1e3, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
