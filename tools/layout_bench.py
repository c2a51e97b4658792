"""NCHW vs NHWC layout ablation for the compact engine's full-map glue.

The gated engine's non-ViT time is dominated by elementwise/reduction work
over [B, H, W, 19] maps — 19 of 128 lanes busy when C is minor. This tool
measures the same ops with W minor (channel-sublane NCHW layout) at the
headline bench shapes (group 8 x 1024x2048, bucket 28, C=19):

  * the chained dynamic-slice delta blend (fp32 base)
  * the 512x1024 -> 1024x2048 bilinear logits resize (bf16)
  * the confidence gate (fused max+exp-sum) + per-window box means
  * the fp32 base cast
  * the layout-conversion transposes a mixed pipeline would need
    (per-window crops to/from the NHWC ViT, final full-map output)

Prints one JSON row per measurement to stdout and /tmp/layout_bench.json.
"""

import json
import os
import sys

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tools.profile_gated import time_chain  # noqa: E402
from vfmseg_tpu.eval.slide import compute_slide_grid  # noqa: E402
from vfmseg_tpu.ops.resize import _interp_matrix  # noqa: E402

G, H, W, C, K = 8, 1024, 2048, 19, 28
CH, CW = 512, 512
LRH, LRW = 512, 1024
ITERS = 8

rows = []


def report(tag, sec, note=""):
    row = {"component": tag, "ms": round(sec * 1e3, 3), "note": note}
    rows.append(row)
    print(json.dumps(row), flush=True)


def dep(x, acc):
    return x + (acc * 1e-12).astype(x.dtype)


def main():
    boxes = compute_slide_grid((H, W), (CH, CW), (320, 320))
    nb = len(boxes)
    key = jax.random.PRNGKey(0)
    base_nhwc = jax.random.normal(key, (G, H, W, C), jnp.float32)
    base_nchw = jnp.transpose(base_nhwc, (0, 3, 1, 2))
    full_bf = base_nhwc.astype(jnp.bfloat16)
    full_bf_nchw = base_nchw.astype(jnp.bfloat16)
    lr_nhwc = jax.random.normal(key, (G, LRH, LRW, C), jnp.bfloat16)
    lr_nchw = jnp.transpose(lr_nhwc, (0, 3, 1, 2))
    delta_nhwc = jax.random.normal(key, (K, CH, CW, C), jnp.float32)
    delta_nchw = jnp.transpose(delta_nhwc, (0, 3, 1, 2))
    idx = np.arange(K)
    gi = jnp.asarray(idx % G, jnp.int32)
    ys = jnp.asarray([boxes[i % nb][0] for i in idx], jnp.int32)
    xs = jnp.asarray([boxes[i % nb][1] for i in idx], jnp.int32)

    # ---- blend chain -----------------------------------------------------
    def blend_nhwc(base, d, acc):
        base = dep(base, acc)

        def body(i, out):
            r = jax.lax.dynamic_slice(out, (gi[i], ys[i], xs[i], 0),
                                      (1, CH, CW, C))
            r = r + d[i][None]
            return jax.lax.dynamic_update_slice(out, r,
                                                (gi[i], ys[i], xs[i], 0))

        out = jax.lax.fori_loop(0, K, body, base)
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report("blend_chain_k28_nhwc", time_chain(blend_nhwc, ITERS,
                                              base_nhwc, delta_nhwc))

    def blend_nchw(base, d, acc):
        base = dep(base, acc)

        def body(i, out):
            r = jax.lax.dynamic_slice(out, (gi[i], 0, ys[i], xs[i]),
                                      (1, C, CH, CW))
            r = r + d[i][None]
            return jax.lax.dynamic_update_slice(out, r,
                                                (gi[i], 0, ys[i], xs[i]))

        out = jax.lax.fori_loop(0, K, body, base)
        return jnp.sum(out[:, :, ::257, ::257]).astype(jnp.float32)

    report("blend_chain_k28_nchw", time_chain(blend_nchw, ITERS,
                                              base_nchw, delta_nchw))

    # ---- logits resize ---------------------------------------------------
    wh = jnp.asarray(_interp_matrix(LRH, H, "bilinear", False, None),
                     jnp.bfloat16)
    ww = jnp.asarray(_interp_matrix(LRW, W, "bilinear", False, None),
                     jnp.bfloat16)

    def resize_nhwc(x, acc):
        x = dep(x, acc)
        y = jnp.einsum("oh,bhwc->bowc", wh, x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("ow,bhwc->bhoc", ww, y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(y[:, ::257, ::257]).astype(jnp.float32)

    report("resize_up2x_c19_nhwc_bf16", time_chain(resize_nhwc, ITERS,
                                                   lr_nhwc))

    def resize_nchw(x, acc):
        x = dep(x, acc)
        y = jnp.einsum("oh,bchw->bcow", wh, x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("ow,bchw->bcho", ww, y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(y[:, :, ::257, ::257]).astype(jnp.float32)

    report("resize_up2x_c19_nchw_bf16", time_chain(resize_nchw, ITERS,
                                                   lr_nchw))

    # ---- confidence gate + box means --------------------------------------
    def conf_nhwc(f, acc):
        x = dep(f, acc).astype(jnp.float32)
        m = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.sum(jnp.exp(x - m), axis=-1)
        mask = (s < 1.0 / 0.968).astype(jnp.float32)
        per = [jnp.mean(mask[:, y:y + CH, x1:x1 + CW], axis=(1, 2))
               for (y, x1) in boxes]
        return jnp.sum(jnp.concatenate(per)).astype(jnp.float32)

    report("confidence+boxmeans_nhwc", time_chain(conf_nhwc, ITERS, full_bf))

    def conf_nchw(f, acc):
        x = dep(f, acc).astype(jnp.float32)
        m = jnp.max(x, axis=1, keepdims=True)
        s = jnp.sum(jnp.exp(x - m), axis=1)
        mask = (s < 1.0 / 0.968).astype(jnp.float32)  # [B, H, W]
        per = [jnp.mean(mask[:, y:y + CH, x1:x1 + CW], axis=(1, 2))
               for (y, x1) in boxes]
        return jnp.sum(jnp.concatenate(per)).astype(jnp.float32)

    report("confidence+boxmeans_nchw", time_chain(conf_nchw, ITERS,
                                                  full_bf_nchw))

    # ---- fp32 cast --------------------------------------------------------
    def cast_nhwc(f, acc):
        b = dep(f, acc).astype(jnp.float32)
        return jnp.sum(b[:, ::257, ::257]).astype(jnp.float32)

    report("cast_fp32_nhwc", time_chain(cast_nhwc, ITERS, full_bf))

    def cast_nchw(f, acc):
        b = dep(f, acc).astype(jnp.float32)
        return jnp.sum(b[:, :, ::257, ::257]).astype(jnp.float32)

    report("cast_fp32_nchw", time_chain(cast_nchw, ITERS, full_bf_nchw))

    # ---- layout-conversion overheads --------------------------------------
    def win_to_nchw(d, acc):
        out = jnp.transpose(dep(d, acc), (0, 3, 1, 2))
        return jnp.sum(out[:, :, ::257, ::257]).astype(jnp.float32)

    report("transpose_windows_k28_nhwc_to_nchw",
           time_chain(win_to_nchw, ITERS, delta_nhwc))

    def gather_nchw(f, acc):
        f = dep(f, acc)

        def one(i, y, x1):
            return jax.lax.dynamic_slice(f, (i, 0, y, x1),
                                         (1, C, CH, CW))[0]

        out = jax.vmap(one)(gi, ys, xs)
        return jnp.sum(out[:, :, ::257, ::257]).astype(jnp.float32)

    report("gather_windows_k28_nchw", time_chain(gather_nchw, ITERS,
                                                 base_nchw))

    def gather_nhwc(f, acc):
        f = dep(f, acc)

        def one(i, y, x1):
            return jax.lax.dynamic_slice(f, (i, y, x1, 0),
                                         (1, CH, CW, C))[0]

        out = jax.vmap(one)(gi, ys, xs)
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report("gather_windows_k28_nhwc", time_chain(gather_nhwc, ITERS,
                                                 base_nhwc))

    # gather NCHW windows AND hand them to the ViT as NHWC (fused view)
    def gather_nchw_to_nhwc(f, acc):
        f = dep(f, acc)

        def one(i, y, x1):
            return jax.lax.dynamic_slice(f, (i, 0, y, x1),
                                         (1, C, CH, CW))[0]

        out = jnp.transpose(jax.vmap(one)(gi, ys, xs), (0, 2, 3, 1))
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report("gather_windows_k28_nchw_to_nhwc",
           time_chain(gather_nchw_to_nhwc, ITERS, base_nchw))

    def full_to_nhwc(f, acc):
        out = jnp.transpose(dep(f, acc), (0, 2, 3, 1))
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report("transpose_full_fp32_nchw_to_nhwc",
           time_chain(full_to_nhwc, ITERS, base_nchw))

    # argmax consumer comparison (what the evaluator actually reads)
    def argmax_nhwc(f, acc):
        out = jnp.argmax(dep(f, acc), axis=-1)
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report("argmax_full_fp32_nhwc", time_chain(argmax_nhwc, ITERS, base_nhwc))

    def argmax_nchw(f, acc):
        out = jnp.argmax(dep(f, acc), axis=1)
        return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)

    report("argmax_full_fp32_nchw", time_chain(argmax_nchw, ITERS, base_nchw))

    with open("/tmp/layout_bench.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
