"""Per-family eval-throughput benchmark (reproduces the README perf table).

Builds each named config with random device-side weights and times its
configured inference mode end-to-end on Cityscapes-shaped 1024x2048 inputs.

Usage:
  python tools/benchmark_families.py [config ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
os.environ.setdefault("VFMSEG_GELU_APPROX", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

DEFAULT_CONFIGS = (
    "dg_lora_dinov2_ms_masked",      # headline two-stage (dense path here)
    "dg_lora_dinov2_linearhead",
    "dg_rein_dinov2_segformer",
    "dg_lora_dinov2_hrda",
    "dg_rein_dinov2_mask2former",
    "dg_lora_eva02_ms_masked",       # the other three VFM encoder families
    "dg_lora_clip_ms_masked",
    "dg_lora_sam_ms_masked",
)


def run(config: str, hw=(1024, 2048), n: int = 4) -> None:
    from bench import random_variables
    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.eval.evaluator import make_predict_fn
    from vfmseg_tpu.models.build import build_segmentor

    cfg = load_config(config)
    model = build_segmentor(cfg.model, dtype=jnp.bfloat16, attn_impl="auto")
    ch = tuple(cfg.get("crop_size", (512, 512)))
    variables = random_variables(
        model, jnp.zeros((1,) + ch + (3,), jnp.bfloat16),
        jnp.zeros((1,) + ch, jnp.int32))
    predict = make_predict_fn(model, cfg.get("test_cfg", {}), out_hw=hw)
    img = jax.random.normal(jax.random.PRNGKey(0), (1,) + hw + (3,),
                            jnp.bfloat16)
    pred = predict(variables, img)
    float(jnp.sum(pred[:, ::97, ::97].astype(jnp.float32)))   # compile+run
    t0 = time.time()
    for _ in range(n):
        pred = predict(variables, img)
    float(jnp.sum(pred[:, ::97, ::97].astype(jnp.float32)))
    el = (time.time() - t0) / n
    print(f"{config}: {el * 1000:.0f} ms/img = {1 / el:.2f} img/s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=list(DEFAULT_CONFIGS))
    ap.add_argument("-n", type=int, default=4)
    args = ap.parse_args()
    for c in args.configs:
        try:
            run(c, n=args.n)
        except Exception as e:  # keep the sweep going
            print(f"{c}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
