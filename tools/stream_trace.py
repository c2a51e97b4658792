"""Host-side timing trace of CompactMsSlide.stream at the bench shapes.

The gated stream's device work is known from tools/profile_gated.py
(~103 ms stage-1 + ~145-160 ms refine per group of 8); the bench measures
~288 ms/group. This tool times every HOST operation in the stream loop —
group stacking, stage-1 dispatch, confidence readback (np.asarray), bucket
pick, finish dispatch, per-image yields — to locate the gap. Wall times
here include host Python work and any implicit blocking on the async
relay; device execution overlaps them.

Usage:  python tools/stream_trace.py [--images 32] [--group 8] [--depth 3]
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
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 2048))
    args = ap.parse_args()

    from bench import calibrate_logit_scale, random_variables
    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.eval.compact import CompactMsSlide
    from vfmseg_tpu.models.build import build_segmentor
    from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor

    dtype = jnp.bfloat16
    cfg = load_config("dg_lora_dinov2_ms_masked")
    model = build_segmentor(cfg.model, dtype=dtype, attn_impl="auto")
    test_cfg = cfg.test_cfg
    h, w = args.hw
    ih, iw = tuple(cfg.get("crop_size", (1024, 1024)))
    variables = random_variables(
        model, jnp.zeros((1, ih, iw, 3), dtype),
        jnp.zeros((1, ih, iw), jnp.int32))

    images = [jax.random.normal(jax.random.PRNGKey(100 + i), (h, w, 3),
                                dtype) for i in range(args.images)]

    engine = CompactMsSlide(
        lambda v, x: model.apply(v, x, method=MsVFMSegmentor.lr_forward),
        lambda v, c, t: model.apply(v, c, t, False, False,
                                    method=MsVFMSegmentor.hr_forward),
        crop=tuple(test_cfg.get("crop_size", (512, 512))),
        stride=tuple(test_cfg.get("stride", (320, 320))),
        lr_size=tuple(test_cfg.get("lr_img_size", (512, 1024))),
        threshold=test_cfg.get("threshold", 0.968),
        conf=test_cfg.get("conf", 0.8))

    from bench import scale_decode_head
    from vfmseg_tpu.eval.slide import compute_slide_grid

    crop = tuple(test_cfg.get("crop_size", (512, 512)))
    stride = tuple(test_cfg.get("stride", (320, 320)))
    img0 = jnp.stack(images[:args.group])
    full_cal, _c = engine._stage1(variables, img0, (h, w))
    s_seed, _r = calibrate_logit_scale(
        full_cal, test_cfg.get("threshold", 0.968), test_cfg.get("conf", 0.8),
        boxes=compute_slide_grid((h, w), crop, stride), crop=crop)
    variables = scale_decode_head(variables, s_seed)

    # --- instrumented copy of CompactMsSlide.stream ------------------------
    from collections import deque

    def run(trace):
        t = {"stack": 0.0, "s1_dispatch": 0.0, "readback": 0.0,
             "bucket": 0.0, "fin_dispatch": 0.0, "slice_yield": 0.0,
             "buckets": []}

        def timed(tag, fn, *a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            t[tag] += time.perf_counter() - t0
            return r

        pending = deque()
        out_handles = []

        def drain(item):
            img, full, confidence, real = item
            conf_host = timed("readback", np.asarray, confidence)
            t0 = time.perf_counter()
            need = np.nonzero(conf_host < engine.conf)[0]
            from vfmseg_tpu.eval.compact import _bucket
            k = _bucket(len(need), engine.buckets) if len(need) else 0
            t["bucket"] += time.perf_counter() - t0
            t["buckets"].append(int(k))
            hh, ww = img.shape[1], img.shape[2]
            logits = timed(
                "fin_dispatch", engine._finish_fn(k, (hh, ww)),
                variables, img, full, confidence, jnp.int32(real))
            t0 = time.perf_counter()
            for j in range(real):
                out_handles.append(logits[j])
            t["slice_yield"] += time.perf_counter() - t0

        t_start = time.perf_counter()
        n = 0
        for i in range(0, len(images), args.group):
            buf = images[i:i + args.group]
            img = timed("stack", jnp.stack, buf)
            hh, ww = img.shape[1], img.shape[2]
            full, confidence = timed(
                "s1_dispatch", engine._stage1, variables, img, (hh, ww))
            try:
                confidence.copy_to_host_async()
            except AttributeError:
                pass
            pending.append((img, full, confidence, len(buf)))
            if len(pending) > args.depth:
                drain(pending.popleft())
            n += len(buf)

        while pending:
            drain(pending.popleft())
        # force the tail
        jnp.sum(out_handles[-1][::257, ::257]).block_until_ready()
        float(jnp.sum(out_handles[-1][::257, ::257]))
        t["total"] = time.perf_counter() - t_start
        t["img_per_sec"] = n / t["total"]
        return t

    run(False)           # compile everything
    tr = run(False)      # timed, warm
    tr2 = run(False)
    best = tr if tr["total"] < tr2["total"] else tr2
    ng = len(best["buckets"])
    report = {k: (round(v / ng * 1e3, 2) if isinstance(v, float) else v)
              for k, v in best.items() if k != "total"}
    report["ms_per_group_total"] = round(best["total"] / ng * 1e3, 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
