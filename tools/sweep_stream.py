"""Stream dispatch-floor sweep for the gated compact engine (VERDICT r4 #1).

Measures img/s of the headline 1024x2048 gated pipeline across stream
pipeline depth and stage-1 group size, with the gate calibrated ONCE per
group size to the 0.8 operating point. The residue between the measured
29.1 img/s and the 30.4 img/s device-time ceiling (docs/DESIGN.md) is
hypothesized to be per-group dispatch/readback the depth-3 pipeline cannot
hide — this tool turns that hypothesis into a depth x group table.

Usage: python tools/sweep_stream.py [--images 128] [--groups 8 16]
       [--depths 2 3 4 6]
Writes one JSON line per cell to stdout.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
os.environ.setdefault("VFMSEG_GELU_APPROX", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses calibration + model setup)
from vfmseg_tpu.core.config import load_config  # noqa: E402
from vfmseg_tpu.eval.compact import CompactMsSlide  # noqa: E402
from vfmseg_tpu.eval.slide import compute_slide_grid  # noqa: E402
from vfmseg_tpu.models.build import build_segmentor  # noqa: E402
from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--groups", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 3, 4, 6])
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 2048))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--forced-bucket", type=int, default=None,
                    help="zero-sync mode: fixed refine bucket per group, "
                         "no per-group gate readback (bounds the sync cost)")
    args = ap.parse_args()

    dtype = jnp.bfloat16
    cfg = load_config("dg_lora_dinov2_ms_masked")
    model = build_segmentor(cfg.model, dtype=dtype, attn_impl="auto")
    tc = cfg.test_cfg
    crop = tuple(tc.get("crop_size", (512, 512)))
    stride = tuple(tc.get("stride", (320, 320)))
    lr_size = tuple(tc.get("lr_img_size", (512, 1024)))
    threshold = tc.get("threshold", 0.968)
    conf = tc.get("conf", 0.8)
    h, w = args.hw

    ih, iw = tuple(cfg.get("crop_size", (1024, 1024)))
    variables = bench.random_variables(
        model, jnp.zeros((1, ih, iw, 3), dtype),
        jnp.zeros((1, ih, iw), jnp.int32))

    def lr_fn(v, x):
        return model.apply(v, x, method=MsVFMSegmentor.lr_forward)

    def hr_fn(v, c, t):
        return model.apply(v, c, t, False, False,
                           method=MsVFMSegmentor.hr_forward)

    uniq = [jax.random.normal(jax.random.PRNGKey(100 + i), (h, w, 3), dtype)
            for i in range(min(64, args.images))]
    images = [uniq[i % len(uniq)] for i in range(args.images)]

    for group in args.groups:
        compact = CompactMsSlide(lr_fn, hr_fn, crop=crop, stride=stride,
                                 lr_size=lr_size, threshold=threshold,
                                 conf=conf, forced_bucket=args.forced_bucket)
        n_cal = min(len(images), -(-len(uniq) // group) * group)
        img_cals = [jnp.stack(images[i:i + group])
                    for i in range(0, n_cal, group)]
        full_cal, _ = compact._stage1(variables, img_cals[0], (h, w))
        cal_boxes = compute_slide_grid((h, w), crop, stride)
        s_seed, _ = bench.calibrate_logit_scale(
            full_cal, threshold, conf, boxes=cal_boxes, crop=crop)

        def measured_rate(s):
            v2 = bench.scale_decode_head(variables, s)
            rs = []
            for ic in img_cals:
                _c2, conf2 = compact._stage1(v2, ic, (h, w))
                rs.append(float(jnp.mean((conf2 >= conf)
                                         .astype(jnp.float32))))
            return sum(rs) / len(rs)

        lo, hi = s_seed / 8.0, s_seed * 8.0
        while measured_rate(hi) < 0.8 and hi < 1e12:
            lo, hi = hi, hi * 8.0
        best_s, best_r = s_seed, measured_rate(s_seed)
        for _ in range(16):
            mid = (lo * hi) ** 0.5
            r = measured_rate(mid)
            if abs(r - 0.8) < abs(best_r - 0.8):
                best_s, best_r = mid, r
            if abs(r - 0.8) <= 0.002:
                break
            if r < 0.8:
                lo = mid
            else:
                hi = mid
        run_vars = bench.scale_decode_head(variables, best_s)

        def run(depth):
            last = None
            for out in compact.stream(run_vars, images, group=group,
                                      depth=depth):
                last = out
            return float(jnp.sum(last[::128, ::128]).astype(jnp.float32))

        for depth in args.depths:
            run(depth)  # warm compile for this (group, depth) combo
            best = 0.0
            for _ in range(args.repeats):
                compact.reset_stats()
                t0 = time.time()
                run(depth)
                el = time.time() - t0
                best = max(best, args.images / el)
            rate = 1.0 - compact.stat_refined / max(compact.stat_windows, 1)
            print(json.dumps({"group": group, "depth": depth,
                              "forced_bucket": args.forced_bucket,
                              "images_per_sec": round(best, 3),
                              "skip_rate": round(rate, 3)}), flush=True)


if __name__ == "__main__":
    main()
