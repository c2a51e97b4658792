"""Why does the chained dynamic-slice blend cost ~0.5 ms/window?

Each blend iteration touches one [1, 512, 512, 19] fp32 region (~40 MB of
read+write, ~0.05 ms at HBM rate), yet the measured chain runs ~10x over
that floor in BOTH layouts (tools/layout_bench.py) — so it is not a lane
problem, and dus_only (write-only, no read of the region) measured just as
slow as read-modify-write, so it is not an aliasing/copy problem either.
Remaining hypothesis: the slide grid's x offsets (multiples of 320) are
lane-misaligned (320 mod 128 = 64), putting every DUS row on a masked
slow path. These variants bracket that:

  rmw_chain          current formulation at the real 320-stride grid
  dus_only           write-only chain, real grid
  rmw_aligned_x      same chain, x offsets forced to 128-multiples
  rmw_aligned_xy     x 128-aligned and y 8-aligned (sublane granularity)
  rmw_expanded       real grid, but each update is padded out to the
                     surrounding lane-aligned region (the candidate fix:
                     place the delta at lane offset x%128 inside a
                     [ch, cw+128] zero tile — cheap, small buffer — then
                     read-modify-write the aligned region)
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

G, H, W, C, K = 8, 1024, 2048, 19, 28
CH, CW = 512, 512

rows = []


def report(tag, sec, note=""):
    row = {"component": tag, "ms": round(sec * 1e3, 3), "note": note}
    rows.append(row)
    print(json.dumps(row), flush=True)


def dep(x, acc):
    return x + (acc * 1e-12).astype(x.dtype)


def out_sum(out):
    return jnp.sum(out[:, ::257, ::257]).astype(jnp.float32)


def make_rmw(gi, ys, xs):
    def rmw(b, d, acc):
        b = dep(b, acc)

        def body(i, out):
            r = jax.lax.dynamic_slice(out, (gi[i], ys[i], xs[i], 0),
                                      (1, CH, CW, C))
            return jax.lax.dynamic_update_slice(out, r + d[i][None],
                                                (gi[i], ys[i], xs[i], 0))

        return out_sum(jax.lax.fori_loop(0, K, body, b))

    return rmw


def main():
    boxes = compute_slide_grid((H, W), (CH, CW), (320, 320))
    nb = len(boxes)
    base = jax.random.normal(jax.random.PRNGKey(0), (G, H, W, C), jnp.float32)
    delta = jax.random.normal(jax.random.PRNGKey(1), (K, CH, CW, C),
                              jnp.float32)
    idx = np.arange(K)
    gi = jnp.asarray(idx % G, jnp.int32)
    ys_np = np.asarray([boxes[i % nb][0] for i in idx])
    xs_np = np.asarray([boxes[i % nb][1] for i in idx])
    ys = jnp.asarray(ys_np, jnp.int32)
    xs = jnp.asarray(xs_np, jnp.int32)

    report("rmw_chain (current)",
           time_chain(make_rmw(gi, ys, xs), 8, base, delta))

    def dus_only(b, d, acc):
        b = dep(b, acc)

        def body(i, out):
            return jax.lax.dynamic_update_slice(out, d[i][None],
                                                (gi[i], ys[i], xs[i], 0))

        return out_sum(jax.lax.fori_loop(0, K, body, b))

    report("dus_only", time_chain(dus_only, 8, base, delta))

    xs_al = jnp.asarray((xs_np // 128) * 128, jnp.int32)
    report("rmw_aligned_x",
           time_chain(make_rmw(gi, ys, xs_al), 8, base, delta))

    ys_al = jnp.asarray((ys_np // 8) * 8, jnp.int32)
    report("rmw_aligned_xy",
           time_chain(make_rmw(gi, ys_al, xs_al), 8, base, delta))

    # candidate fix: expand each update to the surrounding aligned region
    CWE = CW + 128

    def rmw_expanded(b, d, acc):
        b = dep(b, acc)
        x0 = (xs // 128) * 128          # aligned left edge
        off = xs - x0                   # 0..127 lane offset inside the tile

        def body(i, out):
            dpad = jnp.zeros((1, CH, CWE, C), d.dtype)
            dpad = jax.lax.dynamic_update_slice(
                dpad, d[i][None], (0, 0, off[i], 0))
            r = jax.lax.dynamic_slice(out, (gi[i], ys[i], x0[i], 0),
                                      (1, CH, CWE, C))
            return jax.lax.dynamic_update_slice(out, r + dpad,
                                                (gi[i], ys[i], x0[i], 0))

        return out_sum(jax.lax.fori_loop(0, K, body, b))

    report("rmw_expanded_aligned", time_chain(rmw_expanded, 8, base, delta))

    # same, with y snapped to sublane granularity as well
    CHE = CH + 8

    def rmw_expanded_xy(b, d, acc):
        b = dep(b, acc)
        x0 = (xs // 128) * 128
        offx = xs - x0
        y0 = (ys // 8) * 8
        offy = ys - y0

        def body(i, out):
            dpad = jnp.zeros((1, CHE, CWE, C), d.dtype)
            dpad = jax.lax.dynamic_update_slice(
                dpad, d[i][None], (0, offy[i], offx[i], 0))
            r = jax.lax.dynamic_slice(out, (gi[i], y0[i], x0[i], 0),
                                      (1, CHE, CWE, C))
            return jax.lax.dynamic_update_slice(out, r + dpad,
                                                (gi[i], y0[i], x0[i], 0))

        return out_sum(jax.lax.fori_loop(0, K, body, b))

    report("rmw_expanded_aligned_xy",
           time_chain(rmw_expanded_xy, 8, base, delta))

    # --- round-3 variants: is the ~0.5 ms/window floor a full-carry
    # ping-pong? All prior variants carry the whole [G, H, W, C] buffer
    # through the fori_loop; these shrink or eliminate the dynamic carry.

    # (a) dtype bracket: production blends in bf16 — does traffic halve?
    base16 = base.astype(jnp.bfloat16)
    delta16 = delta.astype(jnp.bfloat16)
    report("rmw_chain_bf16", time_chain(make_rmw(gi, ys, xs), 8,
                                        base16, delta16))

    # (b) per-image carries: the loop carry drops to [H, W, C] (1/G the
    # bytes); windows are distributed statically (K/G + pad per image) so
    # every shape stays static. If the per-iteration cost is a carry
    # ping-pong, this is ~G x cheaper per window.
    per_img = -(-K // G)

    def per_image(b, d, acc):
        b = dep(b, acc)
        outs = []
        for g in range(G):
            def body(i, out, g=g):
                w = g * per_img + i
                wi = jnp.minimum(w, K - 1)
                dd = jnp.where(w < K, d[wi], 0).astype(d.dtype)
                r = jax.lax.dynamic_slice(out, (ys[wi], xs[wi], 0),
                                          (CH, CW, C))
                return jax.lax.dynamic_update_slice(
                    out, r + dd, (ys[wi], xs[wi], 0))

            outs.append(jax.lax.fori_loop(0, per_img, body, b[g]))
        return out_sum(jnp.stack(outs))

    report("per_image_chain", time_chain(per_image, 8, base, delta))

    # (c) dense row-scatter + static position adds: scatter the K deltas
    # into a zeroed [nb * G, CH, CW, C] row layout (unique leading-dim
    # rows — one efficient scatter), then add each grid position's
    # [G, CH, CW, C] slab at its STATIC (y, x) — no dynamic indices, no
    # serial chain, 18 fusible adds.
    box_j = jnp.asarray([i % nb for i in idx], jnp.int32)

    def dense_static(b, d, acc):
        b = dep(b, acc)
        rows_i = box_j * G + gi
        dense = jnp.zeros((nb * G, CH, CW, C), d.dtype)
        dense = dense.at[rows_i].set(d)
        dense = dense.reshape(nb, G, CH, CW, C)
        out = b
        for j, (y1, x1) in enumerate(boxes):
            out = out.at[:, y1:y1 + CH, x1:x1 + CW, :].add(dense[j])
        return out_sum(out)

    report("dense_static_posadds", time_chain(dense_static, 8, base, delta))
    report("dense_static_posadds_bf16",
           time_chain(dense_static, 8, base16, delta16))

    # (d) position-major chain: python loop over the 18 STATIC (y, x)
    # grid positions, inner fori only over a small padded per-position
    # count with a dynamic index in the image dim alone.
    per_pos = -(-K // nb) + 1

    def pos_major(b, d, acc):
        b = dep(b, acc)
        out = b
        for j, (y1, x1) in enumerate(boxes):
            def body(i, o, j=j, y1=y1, x1=x1):
                w = j * per_pos + i
                wi = jnp.minimum(w, K - 1)
                hit = (w < K) & (box_j[wi] == j)
                dd = jnp.where(hit, d[wi], 0).astype(d.dtype)[None]
                r = jax.lax.dynamic_slice(o, (gi[wi], y1, x1, 0),
                                          (1, CH, CW, C))
                return jax.lax.dynamic_update_slice(
                    o, r + dd, (gi[wi], y1, x1, 0))

            out = jax.lax.fori_loop(0, per_pos, body, out)
        return out_sum(out)

    report("pos_major_chain", time_chain(pos_major, 8, base, delta))

    with open("/tmp/blend_variants.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
