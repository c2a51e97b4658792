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

# SAM-H windowed block at 512^2 eval: 32x32 patch grid -> 9 windows of
# 14x14=196 tokens per crop, batch 28 crops -> B'=252, 16 heads, d=80
SAM_WINDOW = (252, 196, 16, 80, 14, 14)


_RTT = None


def measure_rtt() -> float:
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(f(x))
        samples = []
        for _ in range(3):
            t0 = time.time()
            float(f(x))
            samples.append(time.time() - t0)
        _RTT = min(samples)
    return _RTT


def time_chain(fn, x, iters):
    """fn: x -> x-like. Compiles ONE copy and dispatches it `iters` times
    back-to-back — a single TPU core executes launches in order, so the
    calls pipeline and only the last is blocked on (unrolled-in-one-jit
    chains compiled for tens of minutes on Mosaic kernels). The relay
    round-trip is measured separately and subtracted; returns sec/iter."""

    jfn = jax.jit(fn)
    r = jfn(x)
    float(jnp.sum(r[..., ::257, :]))  # compile + force through the relay
    rtt = measure_rtt()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = x
        for _ in range(iters):
            r = jfn(r)
        float(jnp.sum(r[..., ::257, :]))
        best = min(best, max(time.time() - t0 - rtt, 1e-9) / iters)
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
        if name not in SHAPES:
            continue
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

        # --- stock JAX TPU flash kernel (jax.experimental.pallas.ops) ---
        # calibration point: what the upstream hand-tuned kernel sustains
        # at the pipeline's exact shapes
        try:
            from jax.experimental.pallas.ops.tpu import flash_attention as sfa

            def stock_fn(z):
                zr = z.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)
                o = sfa.flash_attention(zr[0], zr[1], zr[2],
                                        sm_scale=d ** -0.5)
                return glue(z, o)

            dt = time_chain(stock_fn, qkv, args.iters)
            report("stock_flash_attention", name, max(dt - t_base, 1e-9), fl)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"kernel": "stock_flash_attention",
                              "shape": name, "error": str(exc)[:200]}),
                  flush=True)

        # --- token-major inference primal ------------------------------
        def tm_fn(z):
            o = fa.flash_attention_qkv_tm(z, h)  # [B, N, E]
            return jnp.concatenate([o, z[..., e:]], axis=-1)

        try:
            dt = time_chain(tm_fn, qkv, args.iters)
            report("flash_qkv_token_major", name, dt, fl)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"kernel": "flash_qkv_token_major",
                              "shape": name, "error": str(exc)[:200]}),
                  flush=True)

    # ---- SAM windowed rel-pos attention (the 1.7 img/s family) ---------
    if "sam_window" in args.shapes or not args.shapes:
        bw, n, h, d, kh, kw = SAM_WINDOW
        fl = 4 * bw * h * n * n * d
        key = jax.random.PRNGKey(1)
        qs = jax.random.normal(key, (bw, h, n, d), dtype) * 0.5
        rel = jax.random.normal(key, (bw, h, n, kh), dtype) * 0.1

        from vfmseg_tpu.ops.attention import xla_attention_decomposed_hm

        def rp_glue(q, o):
            return jnp.concatenate([o[..., :1], q[..., 1:]], axis=-1)

        t_base = time_chain(lambda q: rp_glue(q, q), qs, args.iters)

        def rp_flash(q):
            o = fa.flash_attention_relpos_hm(q, q, q, rel, rel)
            return rp_glue(q, o)

        def rp_xla(q):
            o = xla_attention_decomposed_hm(q, q, q, rel, rel)
            return rp_glue(q, o)

        for tag, fn in (("sam_relpos_flash", rp_flash),
                        ("sam_relpos_xla", rp_xla)):
            try:
                dt = time_chain(fn, qs, args.iters)
                report(tag, "sam_window", max(dt - t_base, 1e-9), fl)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"kernel": tag, "shape": "sam_window",
                                  "error": str(exc)[:200]}), flush=True)

    with open("/tmp/kernel_bench.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
