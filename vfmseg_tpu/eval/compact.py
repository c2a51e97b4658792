"""Compact (gated) two-stage inference: only refine low-confidence crops.

The dense path (eval/slide.ms_slide_inference) refines every window and
selects afterwards — simple, fully jitted, but it pays for windows the gate
discards. With a trained model most windows pass the confidence gate
(reference threshold 0.968 / conf 0.8, Ms_VFM_encoder_decoder.py:446-452),
so production eval can skip their ViT forwards entirely.

Host-orchestrated two-phase design (SURVEY §5.7 "two-pass gather"):
  phase 1 (jit): stage-1 whole pass + per-window confidences (tiny readback)
  phase 2 (jit): gather the windows needing refinement, pad the batch to a
    bucket size (bounded retraces: one compiled graph per bucket), refine,
    blend the refinement deltas back over the stage-1 map.
Outputs are identical to the dense path (the same select semantics).

Sparse-delta formulation: the overlap-average of all-unrefined windows IS
the stage-1 full-resolution map (each covering window contributes the same
full-map crop), so the output decomposes as

    out = full + coverage^-1 * scatter_sum(refined_w - full|box_w)

over REFINED windows only. Stage 1 therefore never materializes the
[G*B, ch, cw, C] window batch (1.4 GB at bs8 1024x2048) the old engine
extracted, softmaxed, carried through the pipeline, and overlap-averaged —
it keeps one [B, H, W, C] map (0.6 GB) and computes window confidences as
box means of the full-map confident-pixel mask (the same pixels, and the
mask is 0/1 so the fp32 box sums are exact regardless of reduction order).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.eval.slide import compute_slide_grid
from vfmseg_tpu.ops.resize import resize

# spacing 2 through the production operating bands (group 8 at ~80% skip
# needs ~29 windows, group 16 needs ~58; padding averages spacing/2 windows
# of wasted refine compute, ~5.5 ms each on ViT-L, so the tighter grid pays
# for its extra cached compiles within a few hundred images).
#
# Advisor r3 asked whether a multiples-of-4 grid (flash pack-4 on every
# bucket) beats spacing 2 (≡2 mod 4 buckets fall back to pack 2/3).
# Measured at the bs8 1024x2048 headline on v5e: spacing-2 (bucket 30,
# pack 3) 28.90 img/s vs mult-4 (bucket 32, pack 4) 28.49 — the ~2 extra
# padded refine windows cost more than pack-4 recovers on the attention
# slice (~14% of refine FLOPs), and the even non-mult-4 buckets still
# pack at 2-3 via the divisor fallback. Spacing 2 stays.
DEFAULT_BUCKETS = (0, 1, 2, 4, 8, 12, 16, 20, 22, 24, 26, 28, 30, 32, 34,
                   36, 38, 40, 44, 48, 50, 52, 54, 56, 58, 60, 62, 64, 66,
                   68, 72, 80, 96, 128, 160)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the table (large groups with an uncalibrated model): round up
    # to a 32-multiple so every needed window is still refined — silently
    # truncating would break the identical-to-dense-path contract
    return -(-n // 32) * 32


def window_confidence(full: jax.Array, boxes, crop: Tuple[int, int],
                      threshold: float) -> jax.Array:
    """Per-window confident-pixel fraction from the full-res logit map.

    Identical numbers to softmaxing extracted window crops (the reference
    gate, Ms_VFM_encoder_decoder.py:446-452): each window's pixels ARE a box
    of the full map, the confident mask is 0/1 so its fp32 box sum is exact,
    and the divisor is the same pixel count. Returns [G*B] box-major
    (window w -> box w // B, image w % B), matching extract_crops order.
    """
    from vfmseg_tpu.eval.slide import confident_mask

    ch, cw = crop
    mask = confident_mask(full, threshold)
    # Integral image instead of one reduction kernel per (overlapping) box:
    # box sums become 4 corner lookups of the 2D prefix sum (measured 4.2 ->
    # ~0.5 ms per bs8 1024x2048 group on v5e). Numerically EXACT vs the
    # direct means: the mask is 0/1, so every prefix sum is an integer
    # (< 2^24, fp32-exact) and each box sum is a difference of exact
    # integers — identical to summing the box directly, in any order.
    s = jnp.cumsum(jnp.cumsum(mask, axis=1), axis=2)       # [B, H, W]
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0)))               # [B, H+1, W+1]
    ys = jnp.asarray([y for (y, _) in boxes], jnp.int32)   # [nbox]
    xs = jnp.asarray([x for (_, x) in boxes], jnp.int32)
    sums = (s[:, ys + ch, xs + cw] - s[:, ys + ch, xs]
            - s[:, ys, xs + cw] + s[:, ys, xs])            # [B, nbox] paired
    per_box = sums / float(ch * cw)
    # box-major flatten: window w -> (box w // B, image w % B)
    return per_box.T.reshape(-1)


def _gather_windows(x: jax.Array, img_idx: jax.Array, ys: jax.Array,
                    xs: jax.Array, crop: Tuple[int, int]) -> jax.Array:
    """[B,H,W,C], per-window (image, y1, x1) -> [K, ch, cw, C]."""
    ch, cw = crop

    def one(i, y, xx):
        return jax.lax.dynamic_slice(
            x, (i, y, xx, 0), (1, ch, cw, x.shape[3]))[0]

    return jax.vmap(one)(img_idx, ys, xs)


class CompactMsSlide:
    """Reusable gated two-stage predictor for one (model, test_cfg)."""

    def __init__(self, lr_logits_fn: Callable, hr_logits_fn: Callable, *,
                 crop: Tuple[int, int] = (512, 512),
                 stride: Tuple[int, int] = (320, 320),
                 lr_size: Tuple[int, int] = (512, 1024),
                 threshold: float = 0.968, conf: float = 0.8,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 align_corners: bool = False,
                 mesh=None, forced_bucket: int = None):
        # forced_bucket (measurement/fixed-budget mode): every stream group
        # refines exactly this bucket size, with the window set still
        # chosen ON DEVICE from the confidences — the per-group host
        # readback (the gate's only sync point) disappears entirely.
        # Output equals the gated path whenever the true refine count
        # <= forced_bucket; a group needing more refines only the first
        # forced_bucket failing windows (ascending window id), so this is
        # NOT the identical-to-dense contract — it bounds what the
        # readback/sync costs in the stream.
        self.lr_fn = lr_logits_fn
        self.hr_fn = hr_logits_fn
        self.crop = crop
        self.stride = stride
        self.lr_size = lr_size
        self.threshold = threshold
        self.conf = conf
        self.buckets = buckets
        self.align_corners = align_corners
        self.forced_bucket = forced_bucket
        # multi-chip: shard the window/crop batch over the mesh's data axis
        # (SURVEY §5.7 — crop batch is the natural eval-scaling axis). The
        # gate itself stays host-side; only the jitted phases shard.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._nshard = int(mesh.shape["data"])
            self._crop_sharding = NamedSharding(mesh, P("data"))
            self._img_sharding = NamedSharding(mesh, P("data"))
        else:
            self._nshard = 1
            self._crop_sharding = None
            self._img_sharding = None
        self._stage1 = jax.jit(self._stage1_impl, static_argnums=(2,))
        # stream fast path: accept the group as a TUPLE of per-image arrays
        # and stack INSIDE the jit — the separate jnp.stack dispatch costs
        # ~2.8 ms of host time per group on the high-latency relay. The
        # stacked batch is returned so the finish fn consumes it without a
        # second stack.
        def _stage1_tuple_impl(variables, imgs, img_hw):
            img = jnp.stack(imgs)
            full, conf = self._stage1_impl(variables, img, img_hw)
            return img, full, conf

        self._stage1_tuple = jax.jit(_stage1_tuple_impl, static_argnums=(2,))
        self._refine: Dict[Any, Callable] = {}
        self._raw_finish: Dict[Any, Callable] = {}
        self.reset_stats()

    def reset_stats(self):
        """Zero the measured gate counters (windows seen / windows refined).
        `1 - stat_refined / stat_windows` is the real skip rate of everything
        run through this predictor since the last reset."""
        self.stat_windows = 0
        self.stat_refined = 0

    def _stage1_impl(self, variables, img, img_hw):
        if self._img_sharding is not None:
            img = jax.lax.with_sharding_constraint(img, self._img_sharding)
        full = self.lr_fn(
            variables,
            resize(img, size=self.lr_size, method="bilinear",
                   align_corners=self.align_corners))
        full = resize(full, size=img_hw, method="bilinear",
                      align_corners=self.align_corners)
        boxes = compute_slide_grid(img_hw, self.crop, self.stride)
        confidence = window_confidence(full, boxes, self.crop, self.threshold)
        return full, confidence

    def _finish_fn(self, k: int, img_hw: Tuple[int, int],
                   split: bool = False) -> Callable:
        """One fused jit per (refine-bucket, image size): gather the k
        low-confidence windows from the stage-1 map, refine, blend the
        deltas back (sparse-delta decomposition, module docstring). A
        single dispatch per group — the eager tail would otherwise issue
        hundreds of small ops, which dominates on high-latency links.

        Delta blending is k chained dynamic-slice adds of delta*coverage^-1
        onto the fp32 base — each touches only its own window region
        (~80 MB of HBM traffic per window, in-place under XLA's buffer
        aliasing). The previous formulation scattered the deltas into the
        dense [G*B, ch, cw, C] window layout and ran the band-decomposed
        overlap-average over ALL G*B slots (zeros included) — 20.9 ms per
        bs8 group vs ~5 ms for the chained adds (v5e, bucket 28)."""
        key = (k, img_hw, split)
        if key not in self._refine:
            from vfmseg_tpu.eval.slide import _coverage_inv

            boxes = compute_slide_grid(img_hw, self.crop, self.stride)
            ch, cw = self.crop
            ys_tab = np.asarray([y for (y, _) in boxes], np.int32)
            xs_tab = np.asarray([x for (_, x) in boxes], np.int32)
            inv_tab = _coverage_inv(tuple(boxes), (ch, cw), tuple(img_hw))

            def fn(variables, img, full, confidence, real):
                # Blend in the model's compute dtype (AMP posture): bf16
                # halves the HBM traffic of the k chained window adds and
                # of every downstream full-map pass; fp32 tiny models in
                # the test suite keep exact dense==compact equality. The
                # per-window delta*coverage product itself stays fp32.
                base = full
                if k == 0:
                    return base
                b = img.shape[0]
                # Window selection runs ON DEVICE from the stage-1
                # confidence vector: the host only picks the bucket size k
                # from its (pipelined) readback. The previous design
                # shipped the selected indices back down as a [2k] int32
                # H2D transfer every group — ~26 ms of un-hideable
                # round-trip per group on the high-latency relay, the
                # single largest non-compute cost in the stream. top_k of
                # the masked window ids reproduces np.nonzero exactly:
                # ascending ids, padded with a sentinel when fewer than k
                # windows need refinement (k always >= the true count —
                # _bucket rounds up).
                w_ids = jnp.arange(confidence.size, dtype=jnp.int32)
                eligible = (w_ids % b) < real    # batch-pad images never refine
                mask = (confidence < self.conf) & eligible
                sentinel = jnp.int32(confidence.size)
                vals = jnp.where(mask, w_ids, sentinel)
                if k > vals.size:
                    # tiny images: the bucket can round above the total
                    # window count — pad with sentinels so top_k is legal
                    vals = jnp.concatenate([
                        vals,
                        jnp.full((k - vals.size,), sentinel, jnp.int32)])
                idx = -jax.lax.top_k(-vals, k)[0]     # k smallest, ascending
                valid = idx < sentinel
                idx = jnp.minimum(idx, sentinel - 1)  # clamp pad rows in-range
                img_i = idx % b
                box_j = idx // b
                ys = jnp.asarray(ys_tab)[box_j]
                xs = jnp.asarray(xs_tab)[box_j]
                g_img = _gather_windows(img, img_i, ys, xs, self.crop)
                g_ctx = _gather_windows(full, img_i, ys, xs, self.crop)
                if self._crop_sharding is not None:
                    g_img = jax.lax.with_sharding_constraint(
                        g_img, self._crop_sharding)
                    g_ctx = jax.lax.with_sharding_constraint(
                        g_ctx, self._crop_sharding)
                refined = self.hr_fn(variables, g_img, g_ctx).astype(
                    full.dtype)
                # padded rows carry a zero delta, so duplicate pad indices
                # cannot clobber real refinements (their adds are no-ops)
                delta = jnp.where(valid[:, None, None, None],
                                  refined - g_ctx, 0.0).astype(full.dtype)
                inv_full = jnp.asarray(inv_tab)          # [H, W, 1] fp32
                inv_w = jax.vmap(lambda y, x: jax.lax.dynamic_slice(
                    inv_full, (y, x, 0), (ch, cw, 1)))(ys, xs)
                delta_scaled = (delta.astype(jnp.float32)
                                * inv_w).astype(base.dtype)
                # The window-blend floor was measured across five
                # formulations at the bs8/bucket-28 headline shape (v5e,
                # fp32 base, incl. the cast): 4D fori DUS chain 14.1 ms,
                # unrolled DUS chain ~17, lax.scatter_add (rectangular
                # updates) 14.6, DMA Pallas kernel (ops/window_blend.py)
                # 35.1, folded-lane [B,H,W*C] chain 85.9. The 4D loop is
                # the floor and the default; VFMSEG_BLEND_IMPL=pallas
                # keeps the kernel reachable for ablation.
                import os as _os

                from vfmseg_tpu.ops import window_blend
                if (_os.environ.get("VFMSEG_BLEND_IMPL", "xla") == "pallas"
                        and jax.default_backend() == "tpu"
                        and base.dtype == jnp.float32
                        and window_blend.supports(
                            boxes, self.crop, img_hw, full.shape[3])):
                    return window_blend.blend_windows(
                        base, delta_scaled, img_i, ys, xs)

                # default: XLA loop (the carry aliases in place)
                def blend(i, out):
                    region = jax.lax.dynamic_slice(
                        out, (img_i[i], ys[i], xs[i], 0),
                        (1, ch, cw, out.shape[3]))
                    region = region + delta_scaled[i][None]
                    return jax.lax.dynamic_update_slice(
                        out, region, (img_i[i], ys[i], xs[i], 0))

                return jax.lax.fori_loop(0, k, blend, base)

            if split:
                inner = fn

                def fn(variables, img, full, confidence, real):
                    out = inner(variables, img, full, confidence, real)
                    # one jit output buffer per image: the stream's
                    # per-image yields hand out finished buffers instead of
                    # dispatching g slice ops per group (~0.45 ms each on
                    # the high-latency relay)
                    return tuple(out[i] for i in range(out.shape[0]))

            # donate img + full: neither is consumed after the finish call
            # (__call__ and stream both drop them), and without donation
            # XLA must copy the [G, H, W, C] base before the in-place
            # blend chain mutates it (~0.3 GB per group at bench shapes)
            self._raw_finish[key] = fn
            self._refine[key] = jax.jit(fn, donate_argnums=(1, 2))
        return self._refine[key]

    def _finish_fused_fn(self, k: int, img_hw: Tuple[int, int],
                         split: bool = True) -> Callable:
        """finish(group i) + stage1(group i+depth) fused into ONE jit
        dispatch — the stream's two per-group dispatches ride a ~ms of
        host/relay time each; fusing halves the per-group dispatch cost
        (VFMSEG_STREAM_FUSE). The next group's images stack inside the jit
        (same trick as _stage1_tuple) and its stage-1 outputs return
        alongside the finished logits. jax.jit retraces per next-group
        shape, so heterogeneous tails still work."""
        key = ("fused", k, img_hw, split)
        if key not in self._refine:
            self._finish_fn(k, img_hw, split)       # populate _raw_finish
            raw = self._raw_finish[(k, img_hw, split)]

            def fused(variables, img, full, confidence, real, next_imgs):
                outs = raw(variables, img, full, confidence, real)
                nimg = jnp.stack(next_imgs)
                nfull, nconf = self._stage1_impl(
                    variables, nimg, tuple(next_imgs[0].shape[:2]))
                return outs, nimg, nfull, nconf

            self._refine[key] = jax.jit(fused, donate_argnums=(1, 2))
        return self._refine[key]

    def __call__(self, variables, img: jax.Array) -> jax.Array:
        """img: [B, H, W, 3] -> (seg logits [B, H, W, C], n_refined)."""
        h, w = img.shape[1], img.shape[2]
        full, confidence = self._stage1(variables, img, (h, w))
        conf_host = np.asarray(confidence)          # tiny readback
        return self._finish(variables, img, full, confidence, conf_host)

    def _finish(self, variables, img, full, confidence, conf_host,
                real=None, split=False, next_buf=None):
        """The host readback (`conf_host`) picks only the STATIC bucket
        size k and feeds the gate stats; the actual window ids are
        re-derived on device inside the finish jit from `confidence`
        (same strict `< conf` test, same ascending order) so no per-group
        H2D transfer rides the critical path."""
        h, w = img.shape[1], img.shape[2]
        g = img.shape[0]
        if real is None:
            real = g
        if real < g:
            # batch-pad images (sharded tail groups) must never refine or
            # count: windows are box-major, window i belongs to image i % g
            conf_host = conf_host.copy()
            conf_host[np.arange(conf_host.size) % g >= real] = np.inf
            self.stat_windows += (conf_host.size // g) * real
        else:
            self.stat_windows += conf_host.size
        need = np.nonzero(conf_host < self.conf)[0]
        self.stat_refined += len(need)
        k = _bucket(len(need), self.buckets) if len(need) else 0
        if k and self._nshard > 1:
            # refine batch shards over the data axis: pad to a multiple
            k = -(-k // self._nshard) * self._nshard
        if next_buf is not None:
            logits, nimg, nfull, nconf = self._finish_fused_fn(
                k, (h, w), split)(variables, img, full, confidence,
                                  jnp.int32(real), tuple(next_buf))
            return logits, len(need), (nimg, nfull, nconf)
        logits = self._finish_fn(k, (h, w), split)(
            variables, img, full, confidence, jnp.int32(real))
        return logits, len(need)

    def stream(self, variables, images, group: int = 4, depth: int = 2):
        """Throughput path: iterate `images` ([H, W, 3] arrays of one shape),
        yielding per-image logits [H, W, C].

        Two levers over __call__ (VERDICT round-1 perf items):
          * stage 1 batches `group` images into one ViT call — the coarse
            pass sees batch 4+ instead of 1, and the refine pool draws
            windows from the whole group (fuller refine buckets);
          * a `depth`-deep software pipeline dispatches group j+1's stage 1
            BEFORE blocking on group j's confidence readback, so the
            host round-trip (the gate's inherent sync point) hides under
            accelerator compute on asynchronous-dispatch backends.

        Memory/size note (v5e 16 GB, 1024x2048 bf16): each in-flight group
        holds a [G, H, W, C] full map (~0.6 GB at G=8, ~1.2 GB at G=16) +
        a [G, H, W, 3] image batch; depth 3 keeps 3 of each. Group 16 /
        depth 3 executes without OOM and measured 28.7 img/s vs 28.9 at
        group 8 on the headline bench — bigger stage-1 batches buy nothing
        past G=8 here, so 8 stays the default.
        """
        from collections import deque

        if self._nshard > 1 and group % self._nshard:
            group = -(-group // self._nshard) * self._nshard

        def pad_to_shards(buf):
            real = len(buf)
            if self._nshard > 1 and real % self._nshard:
                # pad the tail group so the batch still divides the data
                # axis; padded rows are dropped before yielding
                buf = buf + [buf[-1]] * (-(-real // self._nshard)
                                         * self._nshard - real)
            return buf, real

        def chunks():
            buf = []
            for im in images:
                if buf and im.shape != buf[0].shape:
                    # heterogeneous eval sets (per-dataset keep_ratio,
                    # Mapillary): flush the current group when the incoming
                    # shape changes — each group stays one static shape,
                    # the pipeline keeps flowing across shapes (the jits
                    # retrace per shape; callers bound that with buckets)
                    yield pad_to_shards(buf)
                    buf = []
                buf.append(im)
                if len(buf) == group:
                    yield buf, group
                    buf = []
            if buf:
                yield pad_to_shards(buf)

        pending = deque()
        # fused mode: finish(group i) + stage1(group i+depth) in ONE jit
        # dispatch per steady-state group instead of two (the dispatch
        # itself costs ~ms of host/relay time; see _finish_fused_fn)
        import os as _os

        fuse = (_os.environ.get("VFMSEG_STREAM_FUSE", "0") == "1"
                and self._img_sharding is None)

        def start_readback(confidence):
            # start the tiny gate readback NOW so it rides along while later
            # groups dispatch — np.asarray at pop time then returns
            # immediately instead of paying the relay round-trip
            try:
                confidence.copy_to_host_async()
            except AttributeError:
                pass

        def finish(img, full, confidence, real):
            logits, _n = self._finish(variables, img, full, confidence,
                                      np.asarray(confidence), real=real,
                                      split=True)
            for i in range(real):
                yield logits[i]

        if self.forced_bucket is not None:
            # zero-sync mode: no per-group readback at all — one finish
            # dispatch at the fixed bucket per group, stats read at the end
            kf = self.forced_bucket
            confs = []
            for buf, real in chunks():
                h, w = buf[0].shape[0], buf[0].shape[1]
                img, full, confidence = self._stage1_tuple(
                    variables, tuple(buf), (h, w))
                confs.append((confidence, real))
                logits = self._finish_fn(kf, (h, w), True)(
                    variables, img, full, confidence, jnp.int32(real))
                for i in range(real):
                    yield logits[i]
            for confidence, real in confs:
                ch_ = np.asarray(confidence)
                need = int(np.sum(ch_ < self.conf))
                self.stat_windows += ch_.size
                self.stat_refined += min(need, kf)
            return

        for buf, real in chunks():
            h, w = buf[0].shape[0], buf[0].shape[1]
            if fuse and len(pending) >= max(depth, 1):
                img_o, full_o, conf_o, real_o = pending.popleft()
                logits, _n, nxt = self._finish(
                    variables, img_o, full_o, conf_o, np.asarray(conf_o),
                    real=real_o, split=True, next_buf=buf)
                start_readback(nxt[2])
                pending.append((nxt[0], nxt[1], nxt[2], real))
                for i in range(real_o):
                    yield logits[i]
                continue
            if self._img_sharding is not None:
                img = jax.device_put(jnp.stack(buf), self._img_sharding)
                full, confidence = self._stage1(variables, img, (h, w))
            else:
                # single dispatch: stack + stage-1 fused in one jit, the
                # stacked batch returned for the finish fn
                img, full, confidence = self._stage1_tuple(
                    variables, tuple(buf), (h, w))
            start_readback(confidence)
            pending.append((img, full, confidence, real))
            if not fuse and len(pending) > depth:
                yield from finish(*pending.popleft())
        while pending:
            yield from finish(*pending.popleft())
