"""Kernel-level ablation bench: flash attention vs XLA attention vs matmul
roofline at the pipeline's hot shapes (VERDICT r2 item 1b).

Methodology (the axon relay's 30 ms RTT and async dispatch make per-call
timing meaningless):
  * every measurement chains ITERS applications inside ONE jit and reads
    back a scalar;
  * attention variants are timed as (chain with attention) minus (identical
    chain with attention replaced by identity) so the glue (residual add,
    layout ops) cancels;
  * the matmul roofline is a bare z @ w chain (w ~ N(0, 1/e) keeps variance
    stable) — no nonlinearity, nothing but the MXU.

Prints one JSON line per measurement; writes /tmp/kernel_bench.json.
Sweep blocks: VFMSEG_FLASH_BLOCK_Q/_K are read at trace time, so each sweep
point traces a fresh wrapper.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

SHAPES = {
    # refine bucket: 28 gathered 512^2 crops, ViT-L (16 heads, d=64)
    "refine": (28, 1025, 16, 64),
    # stage-1 group: 8 images at 512x1024 -> 2048 tokens + cls
    "stage1": (8, 2049, 16, 64),
}


def time_chain(fn, x, iters):
    """fn: x -> x-like. Chains iters applications UNROLLED inside one jit
    (lax loops carry ~1-3 ms/iteration overhead on the axon backend, which
    swamps ms-scale kernels), returns sec/iter."""

    @jax.jit
    def chain(x):
        for _ in range(iters):
            x = fn(x)
        return x

    r = chain(x)
    float(jnp.sum(r[..., ::257, :]))  # compile + force through the relay
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = chain(x)
        float(jnp.sum(r[..., ::257, :]))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--shapes", nargs="*", default=list(SHAPES))
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep flash block sizes (default: auto only)")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    from vfmseg_tpu.ops import flash_attention as fa
    from vfmseg_tpu.ops.attention import xla_attention

    results = []

    def report(tag, shape_name, dt, flops):
        row = {"kernel": tag, "shape": shape_name,
               "ms": round(dt * 1e3, 3),
               "tflops_per_sec": round(flops / dt / 1e12, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    for name in args.shapes:
        b, n, h, d = SHAPES[name]
        e = h * d
        fl = 4 * b * h * n * n * d
        key = jax.random.PRNGKey(0)

        # --- matmul roofline: bare z @ w chain -------------------------
        w = jax.random.normal(key, (e, e), dtype) * (e ** -0.5)
        xm = jax.random.normal(key, (b * n, e), dtype)
        dt = time_chain(lambda z: z @ w, xm, args.iters)
        report("matmul_roofline[bn,e]x[e,e]", name, dt, 2 * b * n * e * e)

        # --- attention variants: glue-cancelled ------------------------
        qkv = jax.random.normal(key, (b, n, 3 * e), dtype) * 0.5

        def glue(z, o):
            # o: [B, H, N, D] head-major attention output -> feed back
            o = o.transpose(0, 2, 1, 3).reshape(b, n, e)
            return jnp.concatenate([o, z[..., e:]], axis=-1)

        def base_fn(z):
            o = z[..., :e].reshape(b, n, h, d).transpose(0, 2, 1, 3)
            return glue(z, o)

        t_base = time_chain(base_fn, qkv, args.iters)
        report("glue_baseline", name, t_base, 0)

        def xla_fn(z):
            zr = z.reshape(b, n, 3, h, d)
            o = xla_attention(zr[:, :, 0], zr[:, :, 1], zr[:, :, 2])
            return glue(z, o.transpose(0, 2, 1, 3))

        dt = time_chain(xla_fn, qkv, args.iters)
        report("xla_attention", name, max(dt - t_base, 1e-9), fl)

        sweeps = [(None, None)]
        if args.sweep:
            sweeps += [(bq, bk)
                       for bq in (256, 512, 1032)
                       for bk in (256, 344, 516, 1032)]
        for bq, bk in sweeps:
            for var in ("VFMSEG_FLASH_BLOCK", "VFMSEG_FLASH_BLOCK_Q",
                        "VFMSEG_FLASH_BLOCK_K"):
                os.environ.pop(var, None)
            if bq is not None:
                os.environ["VFMSEG_FLASH_BLOCK_Q"] = str(bq)
                os.environ["VFMSEG_FLASH_BLOCK_K"] = str(bk)
            tag = f"flash_qkv[bq={bq or 'auto'},bk={bk or 'auto'}]"

            def fq(z, _salt=(bq, bk)):
                return glue(z, fa.flash_attention_qkv(z, h))

            try:
                dt = time_chain(fq, qkv, args.iters)
                report(tag, name, max(dt - t_base, 1e-9), fl)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"kernel": tag, "shape": name,
                                  "error": str(exc)[:200]}), flush=True)
        for var in ("VFMSEG_FLASH_BLOCK", "VFMSEG_FLASH_BLOCK_Q",
                    "VFMSEG_FLASH_BLOCK_K"):
            os.environ.pop(var, None)

    with open("/tmp/kernel_bench.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
