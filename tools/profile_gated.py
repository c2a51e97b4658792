"""Stage-level timing of the gated (compact) two-stage pipeline.

Times each component of CompactMsSlide at the headline bench shapes
(group=8 images of 1024x2048, refine bucket 28) by chaining ITERS
applications inside one jit with a forced data dependency — per-call wall
timing is meaningless on the async axon relay (~30 ms RTT).

Prints one JSON line per component; use it to find where a stream group's
time goes beyond the two ViT calls. Model components take `variables` as a
jit ARGUMENT — closing over the 300M-param tree embeds it as XLA literal
constants and ships ~600 MB per compile request to the remote service
(observed: >16 min compiles vs ~30 s with the tree as an argument).
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


_RTT = None


def measure_rtt() -> float:
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(f(x))
        _RTT = min(_rtt_once(f, x) for _ in range(3))
    return _RTT


def _rtt_once(f, x):
    t0 = time.time()
    float(f(x))
    return time.time() - t0


def time_chain(make_fn, iters, *args):
    """make_fn(*args) -> scalar-ish; compiles ONE copy and dispatches it
    `iters` times back-to-back — a single TPU core executes launches in
    dispatch order, so the calls pipeline and only the last is blocked on.
    (Unrolling copies inside one jit compiled for 30+ minutes on ViT-L
    components.) The relay round-trip (~30-60 ms) is measured separately
    and subtracted — at ms-scale components it would otherwise dominate."""

    @jax.jit
    def one(args, acc):
        return make_fn(*args, acc)

    acc = jnp.float32(0.0)
    # the remote compile service sporadically drops long-lived connections
    # (Broken pipe) — retry the compiling call a few times before giving up
    for attempt in range(4):
        try:
            float(one(args, acc))
            break
        except jax.errors.JaxRuntimeError as exc:
            transient = any(s in str(exc) for s in (
                "UNAVAILABLE", "remote_compile", "response body closed"))
            if not transient or attempt == 3:
                raise
            print(json.dumps({"retry": attempt + 1,
                              "error": str(exc)[:120]}), flush=True)
            time.sleep(20)
    rtt = measure_rtt()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = acc
        for _ in range(iters):
            r = one(args, r)
        float(r)
        best = min(best, max(time.time() - t0 - rtt, 1e-9) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=28)
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 2048))
    ap.add_argument("--iters", type=int, default=8,
                    help="pipelined dispatch count per measurement")
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filter: measure only matching "
                         "components (one component per process sidesteps "
                         "the relay's long-lived-connection drops)")
    args = ap.parse_args()

    from bench import random_variables
    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.eval.compact import CompactMsSlide, window_confidence
    from vfmseg_tpu.eval.slide import accumulate_crops, compute_slide_grid
    from vfmseg_tpu.models.build import build_segmentor
    from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor
    from vfmseg_tpu.ops.resize import resize

    dtype = jnp.bfloat16
    cfg = load_config("dg_lora_dinov2_ms_masked")
    model = build_segmentor(cfg.model, dtype=dtype, attn_impl="auto")
    test_cfg = cfg.test_cfg
    crop = tuple(test_cfg.get("crop_size", (512, 512)))
    stride = tuple(test_cfg.get("stride", (320, 320)))
    lr_size = tuple(test_cfg.get("lr_img_size", (512, 1024)))
    threshold = test_cfg.get("threshold", 0.968)

    h, w = args.hw
    g, k = args.group, args.bucket
    ih, iw = tuple(cfg.get("crop_size", (1024, 1024)))
    variables = random_variables(
        model, jnp.zeros((1, ih, iw, 3), dtype),
        jnp.zeros((1, ih, iw), jnp.int32))

    boxes = compute_slide_grid((h, w), crop, stride)
    nb = len(boxes)
    ch, cw = crop
    img = jax.random.normal(jax.random.PRNGKey(0), (g, h, w, 3), dtype)
    lr_img = jax.random.normal(jax.random.PRNGKey(1),
                               (g,) + lr_size + (3,), dtype)
    full = jax.random.normal(jax.random.PRNGKey(2), (g, h, w, 19), dtype)
    crops = jax.random.normal(jax.random.PRNGKey(3), (k, ch, cw, 3), dtype)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (k, ch, cw, 19), dtype)

    def feats_fn(v, x, train=False):
        return model.apply(v, x, False, method=MsVFMSegmentor._feats)

    rows = []

    def report(tag, sec, note=""):
        if args.only and not any(sub in tag for sub in args.only):
            return
        if callable(sec):
            sec = sec()
        row = {"component": tag, "ms": round(sec * 1e3, 3), "note": note}
        rows.append(row)
        print(json.dumps(row), flush=True)

    def dep(x, acc):
        return x + (acc * 1e-12).astype(x.dtype)

    # ---- stage-1 pieces ------------------------------------------------
    report("resize_in_1024x2048_to_512x1024", lambda: time_chain(
        lambda im, acc: jnp.sum(resize(dep(im, acc), size=lr_size,
                                       method="bilinear")[:, ::97, ::97]
                                ).astype(jnp.float32),
        args.iters, img))

    report("backbone_lr_8x512x1024", lambda: time_chain(
        lambda v, x, acc: jnp.sum(
            feats_fn(v, dep(x, acc))[-1][:, ::7, ::7, ::97]
        ).astype(jnp.float32),
        args.iters, variables, lr_img))

    report("lr_forward_full (backbone+head+resize512x1024)", lambda: time_chain(
        lambda v, x, acc: jnp.sum(
            model.apply(v, dep(x, acc),
                        method=MsVFMSegmentor.lr_forward)[:, ::97, ::97]
        ).astype(jnp.float32),
        args.iters, variables, lr_img))

    report("resize_logits_512x1024_to_1024x2048_c19", lambda: time_chain(
        lambda x, acc: jnp.sum(resize(
            dep(x, acc)[:, : lr_size[0], : lr_size[1], :], size=(h, w),
            method="bilinear")[:, ::97, ::97]).astype(jnp.float32),
        args.iters, full))

    report("window_confidence_full_map", lambda: time_chain(
        lambda f, acc: jnp.sum(window_confidence(
            dep(f, acc), boxes, crop, threshold)).astype(jnp.float32),
        args.iters, full))

    # ---- refine pieces -------------------------------------------------
    report(f"backbone_hr_{k}x512x512", lambda: time_chain(
        lambda v, x, acc: jnp.sum(
            feats_fn(v, dep(x, acc))[-1][:, ::7, ::7, ::97]
        ).astype(jnp.float32),
        args.iters, variables, crops))

    report(f"hr_forward_full_{k} (backbone+vfmhead+resize)", lambda: time_chain(
        lambda v, x, c, acc: jnp.sum(
            model.apply(v, dep(x, acc), c, False, False,
                        method=MsVFMSegmentor.hr_forward)[:, ::97, ::97]
        ).astype(jnp.float32),
        args.iters, variables, crops, ctx))

    # hr head alone (backbone feats precomputed) + the final resize alone —
    # hr_forward_full minus backbone_hr is ~13 ms/group; this splits it
    def head_method(m, f, c):
        return m.aux_head(f, c, train=False, mask_enable=False)

    feats28 = jax.jit(lambda v, x: feats_fn(v, x))(variables, crops)
    feats28 = jax.tree.map(lambda t: jnp.asarray(t), feats28)

    def head_fn(v, ft, c, acc):
        ft = jax.tree.map(lambda t: dep(t, acc), ft)
        out = model.apply(v, ft, c, method=head_method)
        return jnp.sum(out[:, ::31, ::31]).astype(jnp.float32)

    report(f"aux_head_only_{k}", lambda: time_chain(
        head_fn, args.iters, variables, feats28, ctx))

    head_logits_shape = jax.eval_shape(
        lambda v, ft, c: model.apply(v, ft, c, method=head_method),
        variables, feats28, ctx)
    hl = jax.random.normal(jax.random.PRNGKey(6), head_logits_shape.shape,
                           dtype)
    report(f"hr_final_resize_{tuple(head_logits_shape.shape)}", lambda: time_chain(
        lambda x, acc: jnp.sum(resize(dep(x, acc), size=crop,
                                      method="bilinear")[:, ::97, ::97]
                               ).astype(jnp.float32),
        args.iters, hl))

    # ---- finish pieces -------------------------------------------------
    idx = jnp.arange(k, dtype=jnp.int32)

    def gather_fn(f, acc):
        from vfmseg_tpu.eval.compact import _gather_windows
        ys = jnp.asarray([boxes[i % nb][0] for i in range(k)], jnp.int32)
        xs = jnp.asarray([boxes[i % nb][1] for i in range(k)], jnp.int32)
        gi = idx % g
        out = _gather_windows(dep(f, acc), gi, ys, xs, crop)
        return jnp.sum(out[:, ::97, ::97]).astype(jnp.float32)

    report(f"gather_windows_{k}_from_full", lambda: time_chain(
        gather_fn, args.iters, full))

    delta = jax.random.normal(jax.random.PRNGKey(5), (k, ch, cw, 19), dtype)

    def scatter_fn(d, acc):
        sparse = jnp.zeros((nb * g, ch, cw, 19), d.dtype)
        sparse = sparse.at[idx].add(dep(d, acc), mode="drop")
        out = accumulate_crops(sparse, boxes, (h, w))
        return jnp.sum(out[:, ::97, ::97]).astype(jnp.float32)

    report(f"sparse_scatter+accumulate_{k}", lambda: time_chain(
        scatter_fn, args.iters, delta))

    def base_add_fn(f, acc):
        base = dep(f, acc).astype(jnp.float32)
        return jnp.sum(base[:, ::97, ::97]).astype(jnp.float32)

    report("base_cast_fp32", lambda: time_chain(base_add_fn, args.iters, full))

    # the production blend: k chained dynamic-slice adds on the bf16 base
    ys_b = jnp.asarray([boxes[i % nb][0] for i in range(k)], jnp.int32)
    xs_b = jnp.asarray([boxes[i % nb][1] for i in range(k)], jnp.int32)
    gi_b = idx % g

    def blend_fn(f, d, acc):
        out0 = dep(f, acc)
        dd = dep(d, acc)

        def body(i, out):
            r = jax.lax.dynamic_slice(
                out, (gi_b[i], ys_b[i], xs_b[i], 0), (1, ch, cw, 19))
            return jax.lax.dynamic_update_slice(
                out, r + dd[i][None], (gi_b[i], ys_b[i], xs_b[i], 0))

        out = jax.lax.fori_loop(0, k, body, out0)
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report(f"blend_chain_{k}_bf16", lambda: time_chain(
        blend_fn, args.iters, full, delta))

    # ---- whole phases as the engine runs them ---------------------------
    engine = CompactMsSlide(
        lambda v, x: model.apply(v, x, method=MsVFMSegmentor.lr_forward),
        lambda v, c, t: model.apply(v, c, t, False, False,
                                    method=MsVFMSegmentor.hr_forward),
        crop=crop, stride=stride, lr_size=lr_size,
        threshold=threshold, conf=test_cfg.get("conf", 0.8))

    def stage1_fn(v, im, acc):
        f, conf = engine._stage1_impl(v, dep(im, acc), (h, w))
        return (jnp.sum(f[:, ::257, ::257]) + jnp.sum(conf)).astype(
            jnp.float32)

    report("stage1_impl_total", lambda: time_chain(
        stage1_fn, args.iters, variables, img))

    fin = engine._finish_fn(k, (h, w))
    conf_vec = jnp.linspace(0.0, 1.0, nb * g)
    real = jnp.int32(g)

    def finish_fn(v, im, f, acc):
        out = fin.__wrapped__(v, dep(im, acc), f, conf_vec, real)
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report(f"finish_total_k{k}", lambda: time_chain(
        finish_fn, args.iters, variables, img, full))

    with open("/tmp/profile_gated.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
