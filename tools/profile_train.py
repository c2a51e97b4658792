"""Per-phase decomposition of the two-scale train step (VERDICT r4 #2b).

Times the components of the headline bs2 1024^2 MsVFM training step —
forward, forward+backward, backbone-only fwd and vjp, flash-attention
fwd/bwd at the train shape, optimizer update — with the same pipelined
chained-dispatch methodology as tools/profile_gated.py (per-call wall
timing is meaningless on the async axon relay).

Usage: python tools/profile_train.py [--iters 8] [--only substr ...]
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

from tools.profile_gated import time_chain  # noqa: E402  (shared harness)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from bench import random_variables, vit_fwd_flops
    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.models.build import build_segmentor
    from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor
    from vfmseg_tpu.train import (
        TrainState, make_optimizer, make_train_step, partition_params,
        trainable_predicate)
    from vfmseg_tpu.train.optim import merge_params
    from vfmseg_tpu.train.step import sum_losses

    dtype = jnp.bfloat16
    cfg = load_config("dg_lora_dinov2_ms_masked")
    model = build_segmentor(cfg.model, dtype=dtype, attn_impl="auto")
    bs = args.bs
    ih, iw = tuple(cfg.get("crop_size", (1024, 1024)))
    img = jax.random.normal(jax.random.PRNGKey(0), (bs, ih, iw, 3), dtype)
    labels = jax.random.randint(jax.random.PRNGKey(1), (bs, ih, iw), 0, 19)
    variables = random_variables(
        model, jnp.zeros((1, ih, iw, 3), dtype),
        jnp.zeros((1, ih, iw), jnp.int32))
    params = variables["params"]
    trainable, frozen = partition_params(params, trainable_predicate())
    optimizer = make_optimizer(trainable, base_lr=1e-4, max_steps=40000)
    opt_state = optimizer.init(trainable)

    rngs = {n: jax.random.PRNGKey(10 + i)
            for i, n in enumerate(("crop", "mask", "dropout", "augment"))}

    rows = []

    def wanted(tag):
        return not args.only or any(sub in tag for sub in args.only)

    def report(tag, sec, note=""):
        if not wanted(tag):
            return
        if callable(sec):
            sec = sec()
        row = {"component": tag, "ms": round(sec * 1e3, 3), "note": note}
        rows.append(row)
        print(json.dumps(row), flush=True)

    def dep(x, acc):
        return x + (acc * 1e-12).astype(x.dtype)

    # ---- the full production step (state threaded, donated) -------------
    state0 = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                        frozen=frozen,
                        batch_stats=variables.get("batch_stats", {}),
                        opt_state=opt_state)
    step_fn = make_train_step(model, optimizer, donate=False)

    def run_step(iters):
        st = state0
        batch = {"img": img, "label": labels}
        rng = jax.random.PRNGKey(7)
        st, m = step_fn(st, batch, rng)
        float(m["loss"])
        from tools.profile_gated import measure_rtt
        rtt = measure_rtt()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(iters):
                st, m = step_fn(st, batch, rng)
            float(m["loss"])
            best = min(best, max(time.time() - t0 - rtt, 1e-9) / iters)
        return best

    report("train_step_total", lambda: run_step(args.iters))

    # ---- forward loss only (no grad) ------------------------------------
    bstats = variables.get("batch_stats", {})

    def fwd_loss(tr, im, acc):
        p = merge_params(tr, frozen)
        v = {"params": p}
        mut = False
        if bstats:
            v["batch_stats"] = bstats
            mut = ["batch_stats"]
        out = model.apply(v, dep(im, acc), labels, rngs=rngs, mutable=mut)
        losses = out[0] if mut else out
        return sum_losses(losses).astype(jnp.float32)

    report("loss_fwd_only", lambda: time_chain(
        fwd_loss, args.iters, trainable, img))

    # ---- forward+backward (no optimizer) --------------------------------
    def fwd_bwd(tr, im, acc):
        def lf(t):
            p = merge_params(t, frozen)
            v = {"params": p}
            mut = False
            if bstats:
                v["batch_stats"] = bstats
                mut = ["batch_stats"]
            out = model.apply(v, dep(im, acc), labels, rngs=rngs, mutable=mut)
            losses = out[0] if mut else out
            return sum_losses(losses)
        loss, grads = jax.value_and_grad(lf)(tr)
        return (loss + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)) * 1e-12,
            grads, jnp.float32(0.0))).astype(jnp.float32)

    report("loss_fwd_bwd", lambda: time_chain(
        fwd_bwd, args.iters, trainable, img))

    # ---- optimizer update alone -----------------------------------------
    if wanted("optimizer_update_only"):
        # zero grads suffice to time the AdamW update chain
        grads0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)

        def opt_only(tr, gr, os_, acc):
            gr = jax.tree_util.tree_map(lambda g: dep(g, acc), gr)
            updates, _ = optimizer.update(gr, os_, tr)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                updates, jnp.float32(0.0)) * 1e-12

        report("optimizer_update_only", lambda: time_chain(
            opt_only, args.iters, trainable, grads0, opt_state))

    # ---- backbone alone at the batched train shape ----------------------
    crop_hw = tuple(cfg.get_path("model.hr_crop_size", (512, 512)))
    x4 = jax.random.normal(jax.random.PRNGKey(3),
                           (2 * bs,) + crop_hw + (3,), dtype)

    def feats_fn(v, x, train):
        return model.apply(v, x, train, rngs=rngs if train else None,
                           method=MsVFMSegmentor._feats)  # ViT: no BN

    def bb_fwd(tr, x, acc):
        p = merge_params(tr, frozen)
        f = feats_fn({"params": p}, dep(x, acc), True)
        return jnp.sum(f[-1][:, ::7, ::7, ::97]).astype(jnp.float32)

    report(f"backbone_fwd_{2*bs}x{crop_hw[0]}", lambda: time_chain(
        bb_fwd, args.iters, trainable, x4))

    def bb_fwd_bwd(tr, x, acc):
        def lf(t):
            p = merge_params(t, frozen)
            f = feats_fn({"params": p}, dep(x, acc), True)
            return sum(jnp.sum(fi.astype(jnp.float32) ** 2) for fi in f)
        loss, grads = jax.value_and_grad(lf)(tr)
        return (loss * 1e-12 + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)) * 1e-12,
            grads, jnp.float32(0.0))).astype(jnp.float32)

    report(f"backbone_fwd_bwd_{2*bs}x{crop_hw[0]}", lambda: time_chain(
        bb_fwd_bwd, args.iters, trainable, x4))

    # ---- flash attention fwd / bwd at the train shape -------------------
    from vfmseg_tpu.ops.attention import multi_head_attention

    ntok = (crop_hw[0] // 16) * (crop_hw[1] // 16) + 1
    q = jax.random.normal(jax.random.PRNGKey(4), (2 * bs, ntok, 16, 64),
                          dtype)

    def attn_fwd(q, acc):
        qq = dep(q, acc)
        o = multi_head_attention(qq, qq, qq)
        return jnp.sum(o[:, ::31, :, ::17]).astype(jnp.float32)

    report(f"flash_fwd_{2*bs}x{ntok}t_24x", lambda: time_chain(
        lambda q, acc: jax.lax.fori_loop(
            0, 24, lambda i, a: a + attn_fwd(q, a * 1e-12),
            attn_fwd(q, acc)),
        args.iters, q))

    def attn_bwd(q, acc):
        def lf(qq):
            o = multi_head_attention(qq, qq, qq)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(lf)(dep(q, acc))
        return (l * 1e-12 + jnp.sum(jnp.abs(g).astype(jnp.float32)) * 1e-12)

    report(f"flash_fwd_bwd_{2*bs}x{ntok}t_24x", lambda: time_chain(
        lambda q, acc: jax.lax.fori_loop(
            0, 24, lambda i, a: a + attn_bwd(q, a * 1e-12),
            attn_bwd(q, acc)),
        args.iters, q))

    # ---- analytic FLOP references ---------------------------------------
    f_fwd = 2 * bs * 2 * vit_fwd_flops(ntok)
    print(json.dumps({"note": "flops", "backbone_fwd_tf": round(
        f_fwd / 2 / 1e12, 3), "step_fwd_bwd_tf": round(
        f_fwd * 2 / 1e12 / 2, 3)}), flush=True)

    with open("/tmp/profile_train.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
