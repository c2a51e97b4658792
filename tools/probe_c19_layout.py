"""Probe: do C=19-minor logit maps pay a 128-lane padding tax in HBM?

XLA/TPU default layouts tile the two minormost dims to (8, 128); a
[B, H, W, 19] map crossing a jit boundary would then occupy 128/19 = 6.7x
its logical bytes and every bandwidth-bound pass over it (resize, gate
mask, gather, blend) would move padded tiles. If true, the gated engine's
full-res maps should be carried channel-major ([B, 19, H, W] -> W minor,
fully used lanes).

Times a materializing x*1.0001 over both layouts, the separable 2x resize
in both orientations, and live-buffer deltas, on the real backend.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def timeit(f, *args, iters=8):
    r = f(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            r = f(*args)
        jax.block_until_ready(r)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    from vfmseg_tpu.ops.resize import _interp_matrix

    b, h, w, c = 8, 1024, 2048, 19
    key = jax.random.PRNGKey(0)
    nhwc = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    nchw = jnp.transpose(nhwc, (0, 3, 1, 2))
    jax.block_until_ready((nhwc, nchw))

    stats = jax.local_devices()[0].memory_stats() or {}
    print(json.dumps({"bytes_in_use_after_alloc": stats.get("bytes_in_use"),
                      "logical_two_maps_mb": round(2 * b * h * w * c * 2 / 1e6,
                                                   1)}), flush=True)

    mul = jax.jit(lambda x: x * jnp.bfloat16(1.0001))
    print(json.dumps({"mul_nhwc_ms": round(timeit(mul, nhwc), 3),
                      "mul_nchw_ms": round(timeit(mul, nchw), 3)}), flush=True)

    # separable 2x bilinear upsample, both orientations
    wh = jnp.asarray(_interp_matrix(h // 2, h, "bilinear", False, None),
                     jnp.bfloat16)
    ww = jnp.asarray(_interp_matrix(w // 2, w, "bilinear", False, None),
                     jnp.bfloat16)
    nhwc_half = jax.random.normal(key, (b, h // 2, w // 2, c), jnp.bfloat16)
    nchw_half = jnp.transpose(nhwc_half, (0, 3, 1, 2))

    @jax.jit
    def up_nhwc(x):
        y = jnp.einsum("oh,bhwc->bowc", wh, x,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.einsum("ow,bhwc->bhoc", ww, y,
                          preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)

    @jax.jit
    def up_nchw(x):
        y = jnp.einsum("oh,bchw->bcow", wh, x,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.einsum("ow,bchw->bcho", ww, y,
                          preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)

    print(json.dumps({
        "resize2x_nhwc_ms": round(timeit(up_nhwc, nhwc_half), 3),
        "resize2x_nchw_ms": round(timeit(up_nchw, nchw_half), 3)}),
        flush=True)

    # gate mask (softmax-free confident sweep) both orientations
    @jax.jit
    def mask_nhwc(x):
        m = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.sum(jnp.exp((x - m).astype(jnp.float32)), axis=-1)
        return s < (1.0 / 0.968)

    @jax.jit
    def mask_nchw(x):
        m = jnp.max(x, axis=1, keepdims=True)
        s = jnp.sum(jnp.exp((x - m).astype(jnp.float32)), axis=1)
        return s < (1.0 / 0.968)

    print(json.dumps({
        "gatemask_nhwc_ms": round(timeit(mask_nhwc, nhwc), 3),
        "gatemask_nchw_ms": round(timeit(mask_nchw, nchw), 3)}), flush=True)

    # chained DUS window blend (k=28) both orientations
    k, ch, cw = 28, 512, 512
    rng = np.random.RandomState(0)
    img_i = jnp.asarray(rng.randint(0, b, k), jnp.int32)
    ys = jnp.asarray(rng.randint(0, 2, k) * 320, jnp.int32)
    xs = jnp.asarray(rng.randint(0, 6, k) * 320, jnp.int32)
    d_nhwc = jax.random.normal(key, (k, ch, cw, c), jnp.bfloat16)
    d_nchw = jnp.transpose(d_nhwc, (0, 3, 1, 2))

    @jax.jit
    def blend_nhwc(out, delta):
        def body(i, out):
            r = jax.lax.dynamic_slice(out, (img_i[i], ys[i], xs[i], 0),
                                      (1, ch, cw, c))
            return jax.lax.dynamic_update_slice(
                out, r + delta[i][None], (img_i[i], ys[i], xs[i], 0))
        return jax.lax.fori_loop(0, k, body, out)

    @jax.jit
    def blend_nchw(out, delta):
        def body(i, out):
            r = jax.lax.dynamic_slice(out, (img_i[i], 0, ys[i], xs[i]),
                                      (1, c, ch, cw))
            return jax.lax.dynamic_update_slice(
                out, r + delta[i][None], (img_i[i], 0, ys[i], xs[i]))
        return jax.lax.fori_loop(0, k, body, out)

    print(json.dumps({
        "blend28_nhwc_ms": round(timeit(blend_nhwc, nhwc, d_nhwc), 3),
        "blend28_nchw_ms": round(timeit(blend_nchw, nchw, d_nchw), 3)}),
        flush=True)

    # window gather (28 windows) both orientations
    @jax.jit
    def gather_nhwc(x):
        def one(i, y, xx):
            return jax.lax.dynamic_slice(x, (i, y, xx, 0), (1, ch, cw, c))[0]
        return jax.vmap(one)(img_i, ys, xs)

    @jax.jit
    def gather_nchw(x):
        def one(i, y, xx):
            return jax.lax.dynamic_slice(x, (i, 0, y, xx), (1, c, ch, cw))[0]
        return jax.vmap(one)(img_i, ys, xs)

    print(json.dumps({
        "gather28_nhwc_ms": round(timeit(gather_nhwc, nhwc), 3),
        "gather28_nchw_ms": round(timeit(gather_nchw, nchw), 3)}), flush=True)

    # transpose cost at the boundary (head output -> channel-major)
    tr = jax.jit(lambda x: jnp.transpose(x, (0, 3, 1, 2)))
    small = jax.random.normal(key, (b, h // 2, w // 2, c), jnp.bfloat16)
    print(json.dumps({
        "transpose_full_ms": round(timeit(tr, nhwc), 3),
        "transpose_half_ms": round(timeit(tr, small), 3)}), flush=True)


if __name__ == "__main__":
    main()
