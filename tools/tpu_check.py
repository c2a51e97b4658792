"""On-hardware numerics check for the Pallas kernel suite.

The pytest suite pins CPU (tests/conftest.py) so the Mosaic kernels are only
ever exercised there through interpret-mode XLA equivalence. This script runs
the same kernel-vs-XLA assertions on whatever backend is actually live —
under axon that is the real TPU chip — and exits non-zero on any drift
beyond budget. Run it after kernel changes and before benches:

    python tools/tpu_check.py            # full battery, ~2 min incl. compile
    python tools/tpu_check.py --quick    # flagship shapes only

Covers every production entry point of ops/flash_attention.py (plain,
head-major, fused-qkv, token-major, rel-pos primal) plus RoPE and the gated
engine's accumulate path. Budgets are TPU-matmul-precision scale (bf16 MXU
passes inside fp32 kernels): 3e-3 absolute on O(1)-normalized outputs.

Reference behavior checked: xformers memory_efficient_attention semantics
(/root/reference/rein/models/backbones/dino_layers/attention.py) and SAM's
decomposed rel-pos attention (sam_vit.py:392-432).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ATOL = 3e-3


def _rand(seed, shape, dtype=jnp.float32, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype) * scale


def check(name, got, want, atol=ATOL, failures=None):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ok = err <= atol and bool(jnp.all(jnp.isfinite(got)))
    print(json.dumps({"check": name, "max_abs_err": round(err, 6),
                      "atol": atol, "ok": ok}), flush=True)
    if not ok and failures is not None:
        failures.append(name)
    return ok


def run_battery(quick: bool = False):
    """Run the battery on the live backend; returns the failure list.
    Importable (bench.py runs the quick battery before timing so a Mosaic
    numerics regression cannot produce a BENCH artifact — VERDICT r3)."""
    from vfmseg_tpu.ops.attention import (xla_attention,
                                          xla_attention_decomposed_hm,
                                          xla_attention_headmajor)
    from vfmseg_tpu.ops.flash_attention import (flash_attention,
                                                flash_attention_headmajor,
                                                flash_attention_qkv,
                                                flash_attention_qkv_tm,
                                                flash_attention_relpos_hm)

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    failures = []

    # ---- flagship: DINOv2-L stage-1 shape (2049 tokens, 16 heads, d64) ----
    b, n, h, d = 2, 2049, 16, 64
    q, k, v = (_rand(i, (b, n, h, d)) for i in range(3))
    ref = xla_attention(q, k, v)
    check("flash_plain_2049t", flash_attention(q, k, v), ref,
          failures=failures)

    qkv = jnp.concatenate([x.reshape(b, n, h * d) for x in (q, k, v)], -1)
    check("flash_qkv_fused_2049t", flash_attention_qkv(qkv, h),
          ref.transpose(0, 2, 1, 3), failures=failures)
    check("flash_qkv_token_major_2049t", flash_attention_qkv_tm(qkv, h),
          ref.reshape(b, n, h * d), failures=failures)

    # refine shape 1025: the aligned-tail VPU side-chain is active here
    # (auto mode, 12.4% padding threshold) — a tail regression must fail
    # the quick battery that gates the bench
    n1 = 1025
    q1, k1, v1 = (x[:, :n1] for x in (q, k, v))
    qkv1 = jnp.concatenate([x.reshape(b, n1, h * d) for x in (q1, k1, v1)],
                           -1)
    check("flash_qkv_token_major_1025t_tail", flash_attention_qkv_tm(qkv1, h),
          xla_attention(q1, k1, v1).reshape(b, n1, h * d), failures=failures)

    # grad path (training primal keeps the exact online softmax)
    def loss_flash(q):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    check("flash_grad_dq_2049t", jax.grad(loss_flash)(q),
          jax.grad(loss_xla)(q), atol=2e-2, failures=failures)

    # ---- in-kernel RoPE on the TAV primal (EVA02 fused eval path) ----
    # reference = the XLA fallback of the SAME permuted convention, which
    # the CPU suite pins against the head-major rotate_half path
    from vfmseg_tpu.ops.rope import permuted_rope_tables, rope_2d_tables

    cos0, sin0 = rope_2d_tables(32, 32, d)           # 1024 patch tokens
    cos0 = jnp.concatenate([jnp.ones((1, d)), jnp.asarray(cos0)])
    sin0 = jnp.concatenate([jnp.zeros((1, d)), jnp.asarray(sin0)])
    cosP, sinP = permuted_rope_tables(cos0, sin0)
    from vfmseg_tpu.ops.rope import apply_rope_permuted

    qr = apply_rope_permuted(q1, cosP[None, :, None, :],
                             sinP[None, :, None, :])
    kr = apply_rope_permuted(k1, cosP[None, :, None, :],
                             sinP[None, :, None, :])
    check("flash_qkv_tav_rope_1025t",
          flash_attention_qkv_tm(qkv1, h, rope_cs=(cosP, sinP)),
          xla_attention(qr, kr, v1).reshape(b, n1, h * d),
          failures=failures)

    if not quick:
        # ---- head-major (EVA02 RoPE path) ----
        qh, kh, vh = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        check("flash_headmajor_2049t", flash_attention_headmajor(qh, kh, vh),
              xla_attention_headmajor(qh, kh, vh), failures=failures)

        # ---- SAM windowed rel-pos (14x14 windows, d80) ----
        bw, nw, hh, dd, kh_, kw_ = 12, 196, 16, 80, 14, 14
        qs = _rand(10, (bw, hh, nw, dd), scale=0.5)
        ks = _rand(11, (bw, hh, nw, dd), scale=0.5)
        vs = _rand(12, (bw, hh, nw, dd))
        rh = _rand(13, (bw, hh, nw, kh_), scale=0.3)
        rw = _rand(14, (bw, hh, nw, kw_), scale=0.3)
        check("flash_relpos_sam_window",
              flash_attention_relpos_hm(qs, ks, vs, rh, rw),
              xla_attention_decomposed_hm(qs, ks, vs, rh, rw),
              failures=failures)

        # ---- large-logit finiteness of the no-max primal ----
        # |logit| ~ 60 natural, past anything a trained ViT produces. The
        # MXU's split-bf16 fp32 matmul loses relative precision on the
        # wide-dynamic-range p terms whether or not a row max is subtracted;
        # measured 1.2e-2 here vs 1.1e-3 at unit-scale logits (argmax-safe).
        s = (60.0 / d ** 0.5) ** 0.5
        check("flash_no_max_large_logits",
              flash_attention(q * s, k * s, v), xla_attention(q * s, k * s, v),
              atol=2e-2, failures=failures)

        # ---- refine-shape (1025 tokens, bf16 inputs like production) ----
        qb, kb, vb = (x[:, :1025].astype(jnp.bfloat16) for x in (q, k, v))
        check("flash_bf16_1025t", flash_attention(qb, kb, vb),
              xla_attention(qb, kb, vb), atol=2e-2, failures=failures)

        # ---- gated-engine accumulate path ----
        from vfmseg_tpu.eval.slide import (accumulate_crops,
                                           compute_slide_grid)
        hw = (512, 1024)
        boxes = compute_slide_grid(hw, (256, 256), (160, 160))
        crops = _rand(20, (len(boxes) * 2, 256, 256, 19))
        got = accumulate_crops(crops, boxes, hw)
        # scatter-reference
        acc = jnp.zeros((2,) + hw + (19,))
        cnt = jnp.zeros((1,) + hw + (1,))
        for w_, (y, x) in enumerate(boxes):
            acc = acc.at[:, y:y + 256, x:x + 256].add(
                crops[w_ * 2:(w_ + 1) * 2])
            cnt = cnt.at[:, y:y + 256, x:x + 256].add(1.0)
        check("accumulate_crops_gather_vs_scatter", got, acc / cnt,
              atol=1e-4, failures=failures)

    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    failures = run_battery(quick=args.quick)
    if failures:
        print(json.dumps({"result": "FAIL", "failures": failures}),
              flush=True)
        sys.exit(1)
    print(json.dumps({"result": "PASS"}), flush=True)


if __name__ == "__main__":
    main()
