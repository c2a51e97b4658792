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

    def fwd_loss(tr, fz, im, acc):
        p = merge_params(tr, fz)
        v = {"params": p}
        mut = False
        if bstats:
            v["batch_stats"] = bstats
            mut = ["batch_stats"]
        out = model.apply(v, dep(im, acc), labels, rngs=rngs, mutable=mut)
        losses = out[0] if mut else out
        return sum_losses(losses).astype(jnp.float32)

    report("loss_fwd_only", lambda: time_chain(
        fwd_loss, args.iters, trainable, frozen, img))

    # ---- forward+backward (no optimizer) --------------------------------
    def fwd_bwd(tr, fz, im, acc):
        def lf(t):
            p = merge_params(t, fz)
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
        fwd_bwd, args.iters, trainable, frozen, img))

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

    def bb_fwd(tr, fz, x, acc):
        p = merge_params(tr, fz)
        f = feats_fn({"params": p}, dep(x, acc), True)
        return jnp.sum(f[-1][:, ::7, ::7, ::97]).astype(jnp.float32)

    report(f"backbone_fwd_{2*bs}x{crop_hw[0]}", lambda: time_chain(
        bb_fwd, args.iters, trainable, frozen, x4))

    def bb_fwd_bwd(tr, fz, x, acc):
        def lf(t):
            p = merge_params(t, fz)
            f = feats_fn({"params": p}, dep(x, acc), True)
            return sum(jnp.sum(fi.astype(jnp.float32) ** 2) for fi in f)
        loss, grads = jax.value_and_grad(lf)(tr)
        return (loss * 1e-12 + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)) * 1e-12,
            grads, jnp.float32(0.0))).astype(jnp.float32)

    report(f"backbone_fwd_bwd_{2*bs}x{crop_hw[0]}", lambda: time_chain(
        bb_fwd_bwd, args.iters, trainable, frozen, x4))

    # ---- flash attention fwd / bwd at the train shape -------------------
    # one large-batch call instead of a fori_loop of 24 kernels (the loop
    # formulation faulted the TPU worker); batch 48 ~ 24 blocks x bs2
    from vfmseg_tpu.ops.attention import multi_head_attention

    ntok = (crop_hw[0] // 16) * (crop_hw[1] // 16) + 1
    qb = jax.random.normal(jax.random.PRNGKey(4), (48, ntok, 16, 64), dtype)

    def attn_fwd(q, acc):
        qq = dep(q, acc)
        o = multi_head_attention(qq, qq, qq)
        return jnp.sum(o[:, ::31, :, ::17].astype(jnp.float32))

    report(f"flash_fwd_48x{ntok}t", lambda: time_chain(
        attn_fwd, args.iters, qb))

    def attn_bwd(q, acc):
        def lf(qq):
            o = multi_head_attention(qq, qq, qq)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(lf)(dep(q, acc))
        return l * 1e-12 + jnp.sum(jnp.abs(g).astype(jnp.float32)) * 1e-12

    report(f"flash_fwd_bwd_48x{ntok}t", lambda: time_chain(
        attn_bwd, args.iters, qb))

    # ---- flash bwd kernels alone vs the full vjp ------------------------
    # the tm vjp pays qkv->head-major transposes + dqkv reassembly around
    # the two bwd kernels; this isolates the kernel time on ready operands
    if wanted("flash_bwd_kernels"):
        from vfmseg_tpu.ops.flash_attention import (
            _flash_backward_hm, _flash_forward_qkv)

        qkv48 = jnp.concatenate([qb.reshape(48, ntok, 16 * 64)] * 3, -1)
        out_hm, lse = jax.jit(
            lambda z: _flash_forward_qkv(z, 16, 64 ** -0.5))(qkv48)
        out_hm = jnp.asarray(out_hm)
        lse = jnp.asarray(lse)
        qh48 = jnp.asarray(qb.transpose(0, 2, 1, 3))
        g_hm = jax.random.normal(jax.random.PRNGKey(5), out_hm.shape, dtype)

        def bwd_kernels(q, o, l, g, acc):
            dq, dk, dv = _flash_backward_hm(
                dep(q, acc), q, q, l, o, g, 64 ** -0.5, exp2_scale_q=True)
            return (jnp.sum(jnp.abs(dq[:, :, ::31, ::17])) * 1e-6
                    + jnp.sum(jnp.abs(dk[:, :, ::31, ::17])) * 1e-6
                    + jnp.sum(jnp.abs(dv[:, :, ::31, ::17])) * 1e-6
                    ).astype(jnp.float32)

        report(f"flash_bwd_kernels_48x{ntok}t", lambda: time_chain(
            bwd_kernels, args.iters, qh48, out_hm, lse, g_hm))

    # ---- heads + loss, backbone excluded --------------------------------
    # run the full two-scale loss on PRECOMPUTED backbone features by
    # differencing: (loss fwd) - (backbone fwd x2 views) is reported above;
    # here: the decode/aux heads alone on captured feature shapes
    if any(wanted(t) for t in ("heads", "resize", "ce_only", "img_resize",
                               "label_down")):
        from vfmseg_tpu.models.losses import cross_entropy_loss

        p_all = merge_params(trainable, frozen)
        feats1 = jax.jit(lambda tr, fz, x: feats_fn(
            {"params": merge_params(tr, fz)}, x, False))(trainable, frozen,
                                                         x4)
        feats1 = jax.tree.map(jnp.asarray, feats1)
        lrf = jax.tree.map(lambda t: t[:bs], feats1)
        hrf = jax.tree.map(lambda t: t[bs:], feats1)
        ctx = jax.random.normal(jax.random.PRNGKey(8),
                                (bs, crop_hw[0] // 2, crop_hw[1] // 2, 19),
                                dtype)

        def heads_fwd(tr, fz, ft_lr, ft_hr, c, acc):
            p = merge_params(tr, fz)
            v = {"params": p}
            mut = False
            if bstats:
                v["batch_stats"] = bstats
                mut = ["batch_stats"]
            ft_lr = jax.tree.map(lambda t: dep(t, acc), ft_lr)
            lr_logits = model.apply(
                v, ft_lr, True, rngs=rngs, mutable=mut,
                method=lambda m, f, t: m.decode_head(f, train=t))
            hr_logits = model.apply(
                v, ft_hr, c, True, rngs=rngs, mutable=mut,
                method=lambda m, f, cc, t: m.aux_head(f, cc, train=t,
                                                      mask_enable=True))
            if mut:
                lr_logits, hr_logits = lr_logits[0], hr_logits[0]
            return (jnp.sum(lr_logits[:, ::31, ::31].astype(jnp.float32))
                    + jnp.sum(hr_logits[:, ::31, ::31].astype(jnp.float32)))

        report("heads_fwd_only", lambda: time_chain(
            heads_fwd, args.iters, trainable, frozen, lrf, hrf, ctx))

        lab2 = jax.random.randint(jax.random.PRNGKey(9),
                                  (bs,) + crop_hw, 0, 19)
        lg = jax.random.normal(jax.random.PRNGKey(11),
                               (bs, crop_hw[0] // 4, crop_hw[1] // 4, 19),
                               dtype)

        def resize_ce(x, lab, acc):
            from vfmseg_tpu.ops.resize import resize as _resize
            up = _resize(dep(x, acc), size=crop_hw, method="bilinear")
            return cross_entropy_loss(up, lab)

        report("resize_ce_128to512", lambda: time_chain(
            resize_ce, args.iters, lg, lab2))

        def resize_only(x, acc):
            from vfmseg_tpu.ops.resize import resize as _resize
            up = _resize(dep(x, acc), size=crop_hw, method="bilinear")
            return jnp.sum(up[:, ::63, ::63].astype(jnp.float32))

        report("resize_only_128to512_c19", lambda: time_chain(
            resize_only, args.iters, lg))

        big = jax.random.normal(jax.random.PRNGKey(12),
                                (bs,) + crop_hw + (19,), dtype)

        def ce_only(x, lab, acc):
            return cross_entropy_loss(dep(x, acc), lab)

        report("ce_only_512_c19", lambda: time_chain(
            ce_only, args.iters, big, lab2))

        def img_resize(x, acc):
            from vfmseg_tpu.ops.resize import resize as _resize
            return jnp.sum(_resize(dep(x, acc), scale_factor=0.5,
                                   method="bilinear")[:, ::63, ::63]
                           .astype(jnp.float32))

        report("img_resize_1024to512_c3", lambda: time_chain(
            img_resize, args.iters, img))

        def lab_down(x, acc):
            from vfmseg_tpu.ops.resize import nearest_downsample_2x
            y = x + (acc * 0).astype(x.dtype)
            return jnp.sum(nearest_downsample_2x(y)[:, ::63, ::63]
                           .astype(jnp.float32))

        report("label_downsample_1024to512", lambda: time_chain(
            lab_down, args.iters, labels))

    # ---- analytic FLOP references ---------------------------------------
    f_fwd = 2 * bs * 2 * vit_fwd_flops(ntok)
    print(json.dumps({"note": "flops", "backbone_fwd_tf": round(
        f_fwd / 2 / 1e12, 3), "step_fwd_bwd_tf": round(
        f_fwd * 2 / 1e12 / 2, 3)}), flush=True)

    with open("/tmp/profile_train.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
