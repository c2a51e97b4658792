"""Sequential window-add: out[img, y:y+ch, x:x+cw, :] += delta[i] in place.

ABLATION-ONLY (VFMSEG_BLEND_IMPL=pallas): measured SLOWER than the XLA
loop it was built to replace — 35.1 ms vs 14.1 ms per bs8/bucket-28
group on v5e (bit-identical outputs). The strided window DMAs over the
(8,128)-tiled HBM memref run far below sequential bandwidth, and the
read/add/write chain serializes on the overlap-safety wait; XLA's
dynamic-slice loop already keeps its carry in place and its ~0.43
ms/window cost turns out to be the platform's floor for this access
pattern (scatter_add measures the same 14.6 ms; a folded-lane
[B, H, W*C] variant is 6x worse at 85.9 ms). Kept as the measured
record + a probe point should the DMA path improve.

The compact gated engine blends refinement deltas back over the stage-1
map (eval/compact.py sparse-delta decomposition). This kernel runs one
grid cell per window. TPU grid cells execute sequentially, so
overlapping windows accumulate in ascending window order — the same
per-pixel add order as the XLA chain (bit-identical). Each cell DMAs
its region HBM->VMEM, adds the (pre-scaled, pre-shifted) delta, and
DMAs it back; the output buffer aliases the input (in-place), so
untouched pixels keep the stage-1 values without any copy.

Layout: the channel axis folds into lanes ([B, H, W, C] viewed as
[B, H, W*C]) so a window row is one contiguous cw*C-lane strip —
lane-exact for C=19, cw=512 (9728 = 76*128) — instead of a [.., C=19]
minor axis that would pad every vreg 19->128 (6.7x VMEM/VPU waste).
The folded lane origin x*C is NOT generally a 128-multiple (Mosaic
requires provably tile-aligned HBM slices), so each cell reads a
128-aligned lane window of width cw*C + 128 and the caller pre-places
every delta at its residual lane offset (x*C mod 128, plus the edge
clamp) inside a zero-padded buffer — the extra covered pixels get +0.

Reference behavior replaced: the overlap-accumulate preds/count_mat loop
of Ms_VFM_encoder_decoder.py:455-461 (already re-derived as sparse
deltas in eval/compact.py; this is the scatter's fast path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8


def _blend_kernel(img_ref, ys_ref, axc_ref, base_ref, delta_ref, out_ref,
                  scratch, sem_in, sem_out, *, ch: int, width: int):
    del base_ref  # aliased with out_ref; all access goes through out_ref
    i = pl.program_id(0)
    img = img_ref[i]
    y = pl.multiple_of(ys_ref[i], _SUBLANE)
    axc = pl.multiple_of(axc_ref[i], _LANE)
    region = out_ref.at[img, pl.ds(y, ch), pl.ds(axc, width)]
    cin = pltpu.make_async_copy(region, scratch, sem_in)
    cin.start()
    cin.wait()
    scratch[:, :] = scratch[:, :] + delta_ref[0]
    cout = pltpu.make_async_copy(scratch, region, sem_out)
    cout.start()
    # wait before the cell ends: the next window may overlap this region,
    # and its read must observe this write (cells run in order on TPU)
    cout.wait()


def supports(boxes, crop, img_hw, channels: int) -> bool:
    """Static feasibility of the TPU kernel for a slide geometry: window
    row origins must be sublane-aligned and the folded plane must fit the
    aligned read window (callers fall back to the XLA loop otherwise)."""
    ch, cw = crop
    wc = img_hw[1] * channels
    width = cw * channels + _LANE
    return (all(y % _SUBLANE == 0 for (y, _x) in boxes)
            and img_hw[0] >= ch and wc >= width)


def blend_windows(base: jax.Array, delta: jax.Array, img_i: jax.Array,
                  ys: jax.Array, xs: jax.Array) -> jax.Array:
    """base [B,H,W,C] fp32, delta [k,ch,cw,C] fp32 (pre-scaled by the
    coverage reciprocal), window origins (img_i, ys, xs) [k] int32 ->
    base with delta[i] added at each window, in ascending-i order."""
    b, h, w, c = base.shape
    k, ch, cw, _ = delta.shape
    cwc = cw * c
    width = cwc + _LANE
    base_f = base.reshape(b, h, w * c)
    xcs = xs * c
    axc = jnp.minimum((xcs // _LANE) * _LANE, w * c - width)
    shift = xcs - axc                                    # in [0, 2*_LANE)
    pad = jnp.zeros((ch, width), jnp.float32)
    delta_p = jax.vmap(
        lambda d, s: jax.lax.dynamic_update_slice(pad, d, (0, s))
    )(delta.reshape(k, ch, cwc), shift)
    out = pl.pallas_call(
        functools.partial(_blend_kernel, ch=ch, width=width),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(k,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, ch, width), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((ch, width), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(img_i, ys, axc, base_f, delta_p)
    return out.reshape(b, h, w, c)
