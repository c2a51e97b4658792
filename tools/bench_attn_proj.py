"""Decide the production attention layout by timing attention + out-proj.

The kernel-only rows in bench_kernels.py subtract a glue baseline that
differs between the token-major and head-major variants, so they cannot
rank the *in-model* cost, where attention output feeds the projection
matmul directly. This times the real pairing on the live backend:

  tm : o = flash_qkv_tm(qkv)  [B,N,E]        ; y = o @ Wo
  hm : o = flash_qkv(qkv)     [B,H,N,D]      ; y = relayout(o) @ Wo
  xla: o = xla_attention(...) (reshape path)  ; y = o' @ Wo

plus matmul roofline rows at the ViT-L MLP/qkv shapes (is the 116 TF/s
[bn,e]x[e,e] row the real matmul ceiling, or do the fat MLP matmuls do
better?).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

SHAPES = {
    "refine": (28, 1025, 16, 64),
    "stage1": (8, 2049, 16, 64),
}

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
    jfn = jax.jit(fn)
    r = jfn(x)
    float(jnp.sum(r[..., ::257, :]))
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
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--shapes", nargs="*", default=list(SHAPES))
    args = ap.parse_args()

    from vfmseg_tpu.ops import flash_attention as fa
    from vfmseg_tpu.ops.attention import xla_attention

    dtype = jnp.bfloat16
    rows = []

    def report(tag, shape_name, dt, flops):
        row = {"variant": tag, "shape": shape_name,
               "ms": round(dt * 1e3, 3),
               "tflops_per_sec": round(flops / dt / 1e12, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for name in args.shapes:
        b, n, h, d = SHAPES[name]
        e = h * d
        # attention FLOPs + proj FLOPs
        fl = 4 * b * h * n * n * d + 2 * b * n * e * e
        key = jax.random.PRNGKey(0)
        qkv = jax.random.normal(key, (b, n, 3 * e), dtype) * 0.5
        wo = jax.random.normal(key, (e, e), dtype) * (e ** -0.5)

        # feed y back into the qkv slot so the chain has a data dependency
        def rewrap(z, y):
            return jnp.concatenate([y, z[..., e:]], axis=-1)

        def tm_fn(z):
            o = fa.flash_attention_qkv_tm(z, h)
            return rewrap(z, o @ wo)

        def hm_fn(z):
            o = fa.flash_attention_qkv(z, h)          # [B, H2*2-major]
            o = o.transpose(0, 2, 1, 3).reshape(b, n, e)
            return rewrap(z, o @ wo)

        def xla_fn(z):
            zr = z.reshape(b, n, 3, h, d)
            o = xla_attention(zr[:, :, 0], zr[:, :, 1], zr[:, :, 2])
            return rewrap(z, o.reshape(b, n, e) @ wo)

        for tag, fn in (("tm+proj", tm_fn), ("hm+relayout+proj", hm_fn),
                        ("xla+proj", xla_fn)):
            try:
                dt = time_chain(fn, qkv, args.iters)
                report(tag, name, dt, fl)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"variant": tag, "shape": name,
                                  "error": str(exc)[:200]}), flush=True)

        # matmul rooflines at the surrounding ViT-L shapes
        bn = b * n
        for mtag, (mm, kk, nn) in {
            "proj[bn,e]x[e,e]": (bn, e, e),
            "qkv[bn,e]x[e,3e]": (bn, e, 3 * e),
            "mlp_in[bn,e]x[e,4e]": (bn, e, 4 * e),
            "mlp_out[bn,4e]x[4e,e]": (bn, 4 * e, e),
        }.items():
            xm = jax.random.normal(key, (mm, kk), dtype)
            wm = jax.random.normal(key, (kk, nn), dtype) * (kk ** -0.5)
            if kk == nn:
                fn = lambda z, w_=wm: z @ w_
            else:
                wb = jax.random.normal(key, (nn, kk), dtype) * (nn ** -0.5)
                fn = lambda z, w_=wm, wb_=wb: (z @ w_) @ wb_
            dt = time_chain(fn, xm, args.iters)
            flm = 2 * mm * kk * nn * (1 if kk == nn else 2)
            report(f"matmul_{mtag}", name, dt, flm)

    with open("/tmp/attn_proj_bench.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
