"""Multi-scale deformable attention sampling.

TPU-native replacement for the mmcv/mmdet MSDeformAttn CUDA op used by the
Mask2Former pixel decoder (reference config
configs/_base_/models/rein_dinov2_mask2former.py:54-87; SURVEY §7.3).
Semantics follow the original: sampling locations normalized to [0, 1],
bilinear sampling with align_corners=False and zero padding, per-head
per-level per-point softmaxed attention weights.

Two interchangeable sampling backends:
  * gather (`bilinear_sample_nhwc`): 4 gathers + lerp — fast where gathers
    are cheap (CPU), pathological on TPU (measured 67 ms for one pixel-
    decoder layer's samples: TPU has no vector gather hardware).
  * separable one-hot matmul (`bilinear_sample_matmul`): sampled[n] =
    Ry[n] · V · Cx[n] with 2-tap interpolation one-hots built by iota
    comparison — all MXU/VPU work, no gathers, autodiff-friendly. This is
    the TPU default (`ms_deform_attn_core` dispatches on the backend).
All shapes static.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(value: jax.Array, loc: jax.Array) -> jax.Array:
    """Zero-padded bilinear sampling.

    value: [B, H, W, C]; loc: [B, N, 2] normalized (x, y) in [0, 1]
    (grid_sample align_corners=False convention: pixel centers at
    (i + 0.5) / size). Returns [B, N, C].
    """
    return _sample_nhwc_xy(value, loc[..., 0], loc[..., 1])


def _sample_nhwc_xy(value: jax.Array, xn: jax.Array, yn: jax.Array) -> jax.Array:
    """bilinear_sample_nhwc with the coordinates as separate [B, N] arrays
    (N-minor layouts avoid the pathological trailing-2 tiling on TPU)."""
    b, h, w, c = value.shape
    x = xn * w - 0.5
    y = yn * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = value.reshape(b, h * w, c)
        idx = yc * w + xc  # [B, N]
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(inside[..., None], out, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None].astype(value.dtype)
    fy = fy[..., None].astype(value.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _axis_onehot(coord: jax.Array, size: int) -> jax.Array:
    """[B, N] continuous source coords (in pixel units, may be out of
    range) -> [B, N, size] 2-tap interpolation weights (zero outside)."""
    lo = jnp.floor(coord)
    frac = (coord - lo).astype(jnp.float32)
    ids = jnp.arange(size, dtype=jnp.int32)
    lo_i = lo.astype(jnp.int32)[..., None]
    w = (jnp.where(ids == lo_i, 1.0 - frac[..., None], 0.0)
         + jnp.where(ids == lo_i + 1, frac[..., None], 0.0))
    return w


def bilinear_sample_matmul(value: jax.Array, loc: jax.Array) -> jax.Array:
    """Same contract as bilinear_sample_nhwc, as separable one-hot matmuls:
    sampled[b, n, c] = sum_{h, w} Ry[b, n, h] * Cx[b, n, w] * V[b, h, w, c].
    One [N, H] x [H, W*C] matmul per batch row rides the MXU; out-of-range
    taps carry zero weight (grid_sample zero padding)."""
    return _sample_matmul_xy(value, loc[..., 0], loc[..., 1])


def _sample_matmul_xy(value: jax.Array, xn: jax.Array, yn: jax.Array) -> jax.Array:
    """bilinear_sample_matmul with coordinates as separate [B, N] arrays."""
    b, h, w, c = value.shape
    x = xn * w - 0.5
    y = yn * h - 0.5
    ry = _axis_onehot(y, h).astype(value.dtype)     # [B, N, H]
    cx = _axis_onehot(x, w).astype(value.dtype)     # [B, N, W]
    # fp32 inputs must sample at fp32 accuracy (TPU default matmul precision
    # is bf16 passes — measured 4.6e-3 sampling error otherwise); bf16
    # models keep the fast path with fp32 accumulation
    precision = ("highest" if value.dtype == jnp.float32 else None)
    t = jnp.einsum("bnh,bhwc->bnwc", ry, value, precision=precision,
                   preferred_element_type=value.dtype)      # MXU
    return jnp.einsum("bnw,bnwc->bnc", cx, t, precision=precision,
                      preferred_element_type=value.dtype)


def _sample_pallas_xy(value: jax.Array, xn: jax.Array, yn: jax.Array,
                      block_n: int = 128) -> jax.Array:
    """VMEM-fused separable sampling (same contract as _sample_matmul_xy).

    The two-einsum formulation is HBM-bound: its [B, N, W, d] intermediate
    (~700 MB for one 64x64 pixel-decoder level at eval shapes) round-trips
    HBM twice. Here the whole level plane sits in VMEM per grid cell and
    both contractions fuse: y via a 2-tap one-hot matmul on the MXU, x via
    a lane-indexed 2-tap mask + strided reduction on the VPU. The
    intermediate never exists outside VMEM.
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = value.shape
    n = xn.shape[1]
    n_pad = -(-n // block_n) * block_n
    x = (xn * w - 0.5).astype(jnp.float32).reshape(b, n, 1)
    y = (yn * h - 0.5).astype(jnp.float32).reshape(b, n, 1)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        # pad coords far outside the plane: their taps carry zero weight
        x = jnp.pad(x, pad, constant_values=-1e6)
        y = jnp.pad(y, pad, constant_values=-1e6)

    def kernel(y_ref, x_ref, v_ref, o_ref, *, h, w, c):
        yv = y_ref[0]                              # [Tn, 1] fp32
        xv = x_ref[0]
        v = v_ref[0]                               # [h, w*c] (host-collapsed:
        # Mosaic rejects in-kernel [h,w,c]->[h,w*c] shape casts on hardware)
        lo_y = jnp.floor(yv)
        fy = yv - lo_y
        # Mosaic requires integer iota (f32 iota fails TPU verification);
        # compare in int32 — floor values are exact small integers (padded
        # coords at -1e6 stay in int32 range)
        lo_yi = lo_y.astype(jnp.int32)
        ids_h = jax.lax.broadcasted_iota(jnp.int32, (yv.shape[0], h), 1)
        ry = (jnp.where(ids_h == lo_yi, 1.0 - fy, 0.0)
              + jnp.where(ids_h == lo_yi + 1, fy, 0.0))
        t = jax.lax.dot_general(
            ry.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [Tn, w*c]
        lo_x = jnp.floor(xv)
        fx = xv - lo_x
        lo_xi = lo_x.astype(jnp.int32)
        lane_w = jax.lax.broadcasted_iota(
            jnp.int32, (yv.shape[0], w * c), 1) // c
        cxw = (jnp.where(lane_w == lo_xi, 1.0 - fx, 0.0)
               + jnp.where(lane_w == lo_xi + 1, fx, 0.0))
        prod = t * cxw                             # [Tn, w*c]
        # sum over the w groups of c lanes as a one-hot MXU matmul
        # ([Tn,w,c] reshape + axis-1 reduce is another unsupported cast;
        # sub-lane 32-wide strided slices would crawl on the VPU)
        rows = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 1)
        agg = (rows % c == cols).astype(prod.dtype)
        o_ref[0] = jax.lax.dot_general(
            prod, agg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    out = pl.pallas_call(
        functools.partial(kernel, h=h, w=w, c=c),
        grid=(b, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, 1), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, 1), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w * c), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda bi, ni: (bi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), value.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * h * w * c + 2 * b * n_pad * w * c,
            bytes_accessed=(value.size + b * n_pad * c) * value.dtype.itemsize,
            transcendentals=0,
        ),
    )(y, x, value.reshape(b, h, w * c))
    return out[:, :n]


@jax.custom_vjp
def _sample_pallas(value, xn, yn):
    return _sample_pallas_xy(value, xn, yn)


def _sample_pallas_fwd(value, xn, yn):
    return _sample_pallas_xy(value, xn, yn), (value, xn, yn)


def _sample_pallas_bwd(res, g):
    # backward through the (numerically identical) matmul formulation —
    # training shapes are small crops; the fused kernel's win is eval
    value, xn, yn = res
    _, vjp = jax.vjp(_sample_matmul_xy, value, xn, yn)
    return vjp(g)


_sample_pallas.defvjp(_sample_pallas_fwd, _sample_pallas_bwd)


def _sample_impl_xy():
    import os

    if jax.default_backend() == "tpu":
        # measured on v5e (Rein-DINOv2+Mask2Former 1024x2048 slide eval):
        # matmul 2.9 img/s, pallas VMEM-fused 1.5 img/s. The fused kernel
        # eliminates the [B*heads, P*Nq, W, d] HBM intermediate but pays for
        # it in per-query one-hot builds on the VPU (~6 passes over
        # [block, W*d] per cell across ~24k cells/level/layer) — building a
        # one-hot costs the same element count as the matmul it feeds, and
        # the VPU is ~20x slower than the MXU. matmul stays the default;
        # pallas remains opt-in for memory-constrained shapes.
        impl = os.environ.get("VFMSEG_DEFORM_IMPL", "matmul")
        return {"pallas": _sample_pallas,
                "matmul": _sample_matmul_xy,
                "gather": _sample_nhwc_xy}[impl]
    return _sample_nhwc_xy


def ms_deform_attn_core(
    value_list: Sequence[jax.Array],       # per level [B, H_l, W_l, heads, d]
    loc_x: jax.Array,                      # [B, heads, L, P, Nq] in [0,1]
    loc_y: jax.Array,                      # [B, heads, L, P, Nq] in [0,1]
    attention_weights: jax.Array,          # [B, heads, L, P, Nq] (softmaxed
                                           #  over the (L, P) axes jointly)
) -> jax.Array:
    """Returns [B, Nq, heads*d].

    Coordinates arrive as separate x/y arrays with Nq as the MINOR
    dimension: a trailing (..., P, 2) layout tiles catastrophically on TPU
    ((8, 128) vregs padded 64x — measured ~60 ms/layer of pure layout
    shuffling in the Mask2Former pixel decoder before this layout)."""
    b, heads, num_levels, num_points, nq = loc_x.shape
    out = None
    for lvl, value in enumerate(value_list):
        _, h, w, _, d = value.shape
        # fold heads into batch so each head samples its own plane
        v = value.transpose(0, 3, 1, 2, 4).reshape(b * heads, h, w, d)
        x = loc_x[:, :, lvl].reshape(b * heads, num_points * nq)
        y = loc_y[:, :, lvl].reshape(b * heads, num_points * nq)
        sampled = _sample_impl_xy()(v, x, y)            # [B*heads, P*Nq, d]
        sampled = sampled.reshape(b, heads, num_points, nq, d)
        wts = attention_weights[:, :, lvl]              # [B, heads, P, Nq]
        o = jnp.einsum("bhpnd,bhpn->bnhd", sampled, wts.astype(sampled.dtype))
        out = o if out is None else out + o
    return out.reshape(b, nq, heads * d)
