"""Phase-cost decomposition of the flash inference primal.

Times the fused-qkv no-max kernel with each phase knocked out
(VFMSEG_FLASH_ABLATE, ops/flash_attention.py) at the pipeline's hot
shapes, attributing kernel time to: score matmul (MXU, K=64), exp2
(VPU), bf16 cast (VPU), AV matmul (MXU, 65-lane output).

The differences bound what any further softmax micro-optimization can
recover vs the D=64 half-MXU matmul roofline (~98 TF/s on v5e bf16).
Prints one JSON line per variant; writes /tmp/ablate_flash.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

SHAPES = {
    "refine": (28, 1025, 16, 64),
    "stage1": (8, 2049, 16, 64),
}

VARIANTS = ("", "noexp", "nocast", "nomm2", "nomm1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--shapes", nargs="*", default=list(SHAPES))
    args = ap.parse_args()

    from tools.bench_kernels import time_chain

    rows = []
    for name in args.shapes:
        b, n, h, d = SHAPES[name]
        e = h * d
        fl = 4 * b * h * n * n * d
        qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * e),
                                jnp.bfloat16) * 0.5

        for variant in VARIANTS:
            os.environ.pop("VFMSEG_FLASH_ABLATE", None)
            if variant:
                os.environ["VFMSEG_FLASH_ABLATE"] = variant

            def fn(z, _v=variant):
                # fresh import-time read happens at trace time via closure
                from vfmseg_tpu.ops.flash_attention import (
                    flash_attention_qkv_tm)
                o = flash_attention_qkv_tm(z, h)          # [B, N, E]
                return jnp.concatenate([o, z[..., e:]], axis=-1)

            dt = time_chain(fn, qkv, args.iters)
            row = {"variant": variant or "full", "shape": name,
                   "ms": round(dt * 1e3, 3),
                   "tflops_per_sec": round(fl / dt / 1e12, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        os.environ.pop("VFMSEG_FLASH_ABLATE", None)

    with open("/tmp/ablate_flash.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
