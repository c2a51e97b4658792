"""LayerNorm tuned for the TPU ViT hot loop.

flax.linen.LayerNorm (and equivalent inline jnp formulations) lower into
XLA loop fusions whose lane-dim reduction feeds a transposed-layout stat
tensor; on v5e those fusions measured ~1.6 ms per call on [8, 2049, 1024]
bf16 activations — ~15x slower than the HBM traffic warrants. With 48
LayerNorms per ViT-L forward that was ~25% of stage-1 device time.

Here the forward is a single-pass Pallas kernel (row-blocked, fp32 stats in
VMEM, affine applied in-register) and the backward recomputes stats in jnp
(standard LN gradient; training-path fusions are not the eval bottleneck).

Param-tree compatible with flax LayerNorm: {"scale": [C], "bias": [C]}.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, y_ref, *, eps: float):
    x = x_ref[:, :].astype(jnp.float32)            # [bq, C]
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / c
    xc = x - mean
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) / c
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0, :].astype(jnp.float32) + bias_ref[0, :].astype(
        jnp.float32)
    y_ref[:, :] = y.astype(y_ref.dtype)


def _ln_forward(x2d: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float) -> jax.Array:
    rows, c = x2d.shape
    block = min(512, ((rows + 7) // 8) * 8)
    grid = (pl.cdiv(rows, block),)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
    )(x2d, scale.reshape(1, c), bias.reshape(1, c))


def _ln_kernel_3d(x_ref, scale_ref, bias_ref, y_ref, *, eps: float):
    x = x_ref[0, :, :].astype(jnp.float32)        # [bq, C]
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / c
    xc = x - mean
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) / c
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0, 0, :].astype(jnp.float32) + bias_ref[
        0, 0, :].astype(jnp.float32)
    y_ref[0, :, :] = y.astype(y_ref.dtype)


def _ln_forward_3d(x3d: jax.Array, scale: jax.Array, bias: jax.Array,
                   eps: float) -> jax.Array:
    """LN on [lead, N, C] without flattening N into the row-tile dim.

    Flattening [B, N, C] -> [B*N, C] is only a free bitcast when N is a
    multiple of the 8-row tile; at the ViT token count (N = HW//p^2 + 1,
    e.g. 1025) XLA must materialize the re-tiling, and the pair of
    reshapes around the 2D kernel measured ~19 ms per bs28 refine group
    on v5e — 12% of the whole forward. The 3D grid keeps the native
    layout; the final partial row-block is masked by Pallas on store."""
    lead, rows, c = x3d.shape
    block = min(512, ((rows + 7) // 8) * 8)
    grid = (lead, pl.cdiv(rows, block))
    return pl.pallas_call(
        functools.partial(_ln_kernel_3d, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3d.shape, x3d.dtype),
    )(x3d, scale.reshape(1, 1, c), bias.reshape(1, 1, c))


def _ln_reference(x: jax.Array, scale: jax.Array, bias: jax.Array,
                  eps: float) -> jax.Array:
    """Numerics-defining jnp implementation (fp32 stats + affine)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln(x, scale, bias, eps: float):
    orig = x.shape
    if x.ndim >= 3 and orig[-2] % 8 != 0:
        # Unaligned row dim: flattening would force a physical re-tiling
        # copy both ways. Merge only the leading dims (always free) and
        # run the 3D kernel on the native layout.
        lead = 1
        for d in orig[:-2]:
            lead *= d
        y = _ln_forward_3d(x.reshape(lead, orig[-2], orig[-1]),
                           scale, bias, eps)
        return y.reshape(orig)
    y = _ln_forward(x.reshape(-1, orig[-1]), scale, bias, eps)
    return y.reshape(orig)


def _ln_fwd_rule(x, scale, bias, eps: float):
    return _ln(x, scale, bias, eps), (x, scale)


def _ln_bwd_rule(eps: float, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    dyf = gf * scale.astype(jnp.float32)
    dx = rstd * (dyf - jnp.mean(dyf, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dyf * xhat, axis=-1, keepdims=True))
    red_axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=red_axes).astype(scale.dtype)
    dbias = jnp.sum(gf, axis=red_axes).astype(scale.dtype)
    return dx.astype(x.dtype), dscale, dbias


_ln.defvjp(_ln_fwd_rule, _ln_bwd_rule)


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float) -> jax.Array:
    """fp32-stat LayerNorm over the last axis; returns x.dtype."""
    if _use_pallas():
        return _ln(x, scale, bias, eps)
    return _ln_reference(x, scale, bias, eps)


class LayerNorm(nn.Module):
    """Drop-in replacement for flax ``nn.LayerNorm`` (last-axis, affine)."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)
