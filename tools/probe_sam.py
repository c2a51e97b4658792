"""Per-phase decomposition of the SAM ViT-H eval cost (VERDICT r3 item 5).

The two-stage SAM pipeline measures ~2.2 img/s at 1024x2048 — far below the
DINOv2 flagship's 29. This probe times each phase at the production shapes
(512^2 crop -> grid 32x32, window 14 -> padded 42x42 = 9 windows of 196
tokens; 4 global blocks at 1024 tokens) via RTT-subtracted dispatch chains:

    python tools/probe_sam.py [--batch 8]

Phases: patch embed, windowed-block attention (rel-pos flash vs xla), the
window partition/unpartition glue, global-block attention (1024 tokens,
rel-pos 63x63 tables), the 1280x5120 MLP, one full windowed/global block,
and the full 32-block backbone. The grid-32/window-14 padding (42^2 = 1764
padded tokens vs 1024 real, +72% attention area) is reference semantics —
zero-pad tokens participate as kv in the reference's window softmax
(sam_vit.py:301-357), so they cannot be dropped without breaking parity.

Round-4 findings (docs/DESIGN.md "SAM ViT-H eval ceiling"): backbone
143 ms/bs8; window-segment persistence (partition once per segment) was
built, measured +33% SLOWER in a same-process A/B (143 -> 191 ms: XLA
already fuses the per-block relayouts; persistence pays padded tokens on
every per-token op), and reverted. Micro-phase chain timings on the axon
relay fluctuate up to 4x run-to-run — only same-process A/Bs are
trustworthy below ~5 ms.
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

RTT = None


def rtt():
    global RTT
    if RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.float32(0)))
        RTT = min((lambda t0: (float(f(jnp.float32(0))), time.time() - t0)[1])(
            time.time()) for _ in range(3))
    return RTT


def chain(make_fn, *args, iters=6):
    @jax.jit
    def one(args, acc):
        return make_fn(*args, acc)

    acc = jnp.float32(0.0)
    float(one(args, acc))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = acc
        for _ in range(iters):
            r = one(args, r)
        float(r)
        best = min(best, max(time.time() - t0 - rtt(), 1e-9) / iters)
    return best * 1e3


def dep(x, acc):
    return x + (acc * 1e-12).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="crop batch (SAM refine buckets run 8-28)")
    args = ap.parse_args()

    dt = jnp.bfloat16
    b = args.batch
    e, heads, d = 1280, 16, 80
    key = jax.random.PRNGKey(0)
    out = []

    def log(name, ms, note=""):
        row = {"phase": name, "ms": round(ms, 3)}
        if note:
            row["note"] = note
        out.append(row)
        print(json.dumps(row), flush=True)

    # ---- windowed attention: 9b windows x 196 tokens --------------------
    from vfmseg_tpu.ops.attention import (multi_head_attention_decomposed_hm,
                                          xla_attention_decomposed_hm)

    bw = 9 * b
    q = jax.random.normal(key, (bw, heads, 196, d), dt)
    k = jax.random.normal(key, (bw, heads, 196, d), dt)
    v = jax.random.normal(key, (bw, heads, 196, d), dt)
    rh = jax.random.normal(key, (bw, heads, 196, 14), dt) * 0.3
    rw = jax.random.normal(key, (bw, heads, 196, 14), dt) * 0.3
    for impl, fn in (("pallas", multi_head_attention_decomposed_hm),
                     ("xla", xla_attention_decomposed_hm)):
        if impl == "pallas":
            ms = chain(lambda q, k, v, rh, rw, acc: jnp.sum(
                fn(dep(q, acc), k, v, rh, rw)[:, ::7, ::31, ::17]
            ).astype(jnp.float32), q, k, v, rh, rw)
        else:
            ms = chain(lambda q, k, v, rh, rw, acc: jnp.sum(
                fn(dep(q, acc), k, v, rh, rw)[:, ::7, ::31, ::17]
            ).astype(jnp.float32), q, k, v, rh, rw)
        log(f"window_attn_{bw}x196_relpos_{impl}", ms)

    # ---- global attention: b x 1024 tokens ------------------------------
    qg = jax.random.normal(key, (b, heads, 1024, d), dt)
    kg = jax.random.normal(key, (b, heads, 1024, d), dt)
    vg = jax.random.normal(key, (b, heads, 1024, d), dt)
    rhg = jax.random.normal(key, (b, heads, 1024, 32), dt) * 0.3
    rwg = jax.random.normal(key, (b, heads, 1024, 32), dt) * 0.3
    ms = chain(lambda q, k, v, rh, rw, acc: jnp.sum(
        multi_head_attention_decomposed_hm(dep(q, acc), k, v, rh, rw)
        [:, ::7, ::31, ::17]).astype(jnp.float32), qg, kg, vg, rhg, rwg)
    log(f"global_attn_{b}x1024_relpos_pallas", ms)

    # ---- MLP 1280 -> 5120 -> 1280 at 1024 tokens ------------------------
    import flax.linen as nn

    class Mlp(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(5120, dtype=dt)(x)
            h = nn.gelu(h, approximate=True)
            return nn.Dense(e, dtype=dt)(h)

    x_t = jax.random.normal(key, (b, 1024, e), dt)
    m = Mlp()
    mv = m.init(key, x_t)
    ms = chain(lambda p, x, acc: jnp.sum(
        m.apply(p, dep(x, acc))[:, ::97, ::31]).astype(jnp.float32), mv, x_t)
    log(f"mlp_{b}x1024x1280", ms)

    # ---- window partition/unpartition glue ------------------------------
    from vfmseg_tpu.ops.window import window_partition, window_unpartition

    x2d = jax.random.normal(key, (b, 32, 32, e), dt)

    def glue(x, acc):
        wins, pad = window_partition(dep(x, acc), 14)
        back = window_unpartition(wins, 14, pad, (32, 32))
        return jnp.sum(back[:, ::7, ::7, ::97]).astype(jnp.float32)

    ms = chain(glue, x2d)
    log(f"partition_unpartition_{b}x32x32", ms)

    # ---- full backbone (LoRA-SAM-H, 32 blocks) --------------------------
    from bench import random_variables
    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.models.build import build_segmentor
    from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor

    cfg = load_config("dg_lora_sam_ms_masked")
    model = build_segmentor(cfg.model, dtype=dt, attn_impl="auto")
    ih, iw = tuple(cfg.get("crop_size", (1024, 1024)))
    variables = random_variables(
        model, jnp.zeros((1, ih, iw, 3), dt), jnp.zeros((1, ih, iw), jnp.int32))

    img = jax.random.normal(key, (b, 512, 512, 3), dt)

    def feats(v, x, acc):
        f = model.apply(v, dep(x, acc), False, method=MsVFMSegmentor._feats)
        return jnp.sum(f[-1][:, ::7, ::7, ::97]).astype(jnp.float32)

    ms = chain(feats, variables, img, iters=3)
    log(f"backbone_{b}x512x512", ms,
        note="32 blocks; windowed pad 42^2 (+72% attn area, ref semantics)")

    # ---- stage-1 whole pass (512x1024 -> grid 32x64 -> pad 42x70) -------
    img_lr = jax.random.normal(key, (1, 512, 1024, 3), dt)

    def lr(v, x, acc):
        f = model.apply(v, dep(x, acc), method=MsVFMSegmentor.lr_forward)
        return jnp.sum(f[:, ::97, ::97]).astype(jnp.float32)

    ms = chain(lr, variables, img_lr, iters=3)
    log("lr_forward_1x512x1024", ms)

    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
