"""Full-scale numerical parity for the non-DINOv2 VFM families (VERDICT r3
item 2). The toy-dim tests (test_parity_{eva02,clip,sam}.py) pin the
parameterizations; these rerun the same independent torch transcriptions at
REAL model dims, where the scale-dependent numerics live:

  * EVA02-L  1024 embed / 24 blocks / 16 heads, SwiGLU hidden 2730 with
    sub-LN, 2D RoPE with pt_hw_seq_len=16 + interpolated frequencies at the
    512^2 grid (32x32) — the torch RoPE tables here are an INDEPENDENT
    transcription of the reference semantics (eva_02.py:119-161), not our
    ops/rope.py (the toy test shares tables; this one must not).
  * CLIP-L   1024 width / 24 layers / 16 heads, quick_gelu, ln_pre, the
    class-embedding double-add and every-forward bilinear pos resize
    (clip.py:334-345) at 512^2.
  * SAM-H    1280 embed / 32 blocks / 16 heads, window 14, global blocks at
    (7,15,23,31), decomposed rel-pos with the 127->55 runtime table resize
    (sam_vit.py:260-275,392-432) at 448^2 (2x2 windows of 14).

Budgets are recorded in PARITY.md; asserts sit ~20x above measured drift.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from test_parity_clip import TorchClip, _clip_style_state_dict  # noqa: E402
from test_parity_eva02 import TorchEva, _state_dict_eva_names  # noqa: E402
from test_parity_sam import TorchSam, _sam_style_state_dict  # noqa: E402


def _drift(touts, jouts):
    worst_abs = worst_rel = 0.0
    for t, j in zip(touts, jouts):
        j = np.asarray(j, np.float32)
        t = t.numpy() if hasattr(t, "numpy") else np.asarray(t)
        worst_abs = max(worst_abs, float(np.max(np.abs(j - t))))
        worst_rel = max(
            worst_rel, worst_abs / max(float(np.max(np.abs(t))), 1e-9))
    return worst_abs, worst_rel


# --------------------------------------------------------------------------
# EVA02-L
# --------------------------------------------------------------------------

def _torch_rope_tables_independent(gh, gw, head_dim, pt, theta=10000.0):
    """Independent transcription of VisionRotaryEmbeddingFast
    (eva_02.py:119-161): per-axis dim = head_dim // 2, inverse freqs over
    even indices of that half, positions arange(n)/n * pt (intp_freq),
    each frequency repeated twice, row-half then column-half."""
    half = head_dim // 2
    inv = 1.0 / theta ** (
        torch.arange(0, half, 2, dtype=torch.float64)[: half // 2] / half)

    def axis(n):
        t = torch.arange(n, dtype=torch.float64) / n * pt
        f = torch.outer(t, inv)
        return torch.repeat_interleave(f, 2, dim=-1)  # [n, half]

    fy, fx = axis(gh), axis(gw)
    grid = torch.cat(
        [fy[:, None, :].expand(gh, gw, half),
         fx[None, :, :].expand(gh, gw, half)], dim=-1).reshape(gh * gw,
                                                               head_dim)
    return grid.cos().float(), grid.sin().float()


class TorchEvaFull(TorchEva):
    """TorchEva with the production pt_hw_seq_len=16 and the independent
    torch RoPE tables (the base class uses ops/rope.py's tables)."""

    def forward(self, x):
        b = x.shape[0]
        gh, gw = x.shape[2] // self.patch, x.shape[3] // self.patch
        cos, sin = _torch_rope_tables_independent(
            gh, gw, self.dim // self.heads, pt=16)
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        outs = []
        for blk in self.blocks:
            x = blk(x, cos, sin)
            outs.append(x[:, 1:].reshape(b, gh, gw, -1))
        return outs


def test_eva02_l_full_scale_parity():
    from tools.convert_eva2 import convert_eva02_state_dict

    from vfmseg_tpu.models.backbones.eva02 import build_eva02

    torch.manual_seed(1)
    tmodel = TorchEvaFull(dim=1024, depth=24, heads=16, patch=16,
                          img=512).eval()
    tree = convert_eva02_state_dict(
        _state_dict_eva_names(tmodel), target_patch=16, target_img=512)
    jmodel = build_eva02(img_size=512, out_indices=(7, 11, 15, 23),
                         pt_hw_seq_len=16, attn_impl="xla")

    x = (np.random.RandomState(1).randn(1, 512, 512, 3) * 0.5).astype(
        np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    touts = [touts[i] for i in (7, 11, 15, 23)]
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    assert len(jouts) == 4
    worst_abs, worst_rel = _drift(touts, jouts)
    print(f"[fullscale eva02-l fp32] max-abs drift {worst_abs:.3e} "
          f"(rel {worst_rel:.3e})")
    # budget: fp32 reduction-order drift through 24 RoPE+SwiGLU blocks
    # (measured 6.7e-5 abs / 4.8e-6 rel; PARITY.md) — RoPE's trig tables and
    # the 2730-dim SwiGLU hidden accumulate a little more than plain
    # DINOv2's 2.5e-6 on activations that grow to ~14 by block 24
    assert worst_abs < 1.5e-3, worst_abs


# --------------------------------------------------------------------------
# CLIP-L
# --------------------------------------------------------------------------

def test_clip_l_full_scale_parity():
    from tools.convert_clip import convert_clip_state_dict

    from vfmseg_tpu.models.backbones.clip import build_clip

    torch.manual_seed(2)
    tmodel = TorchClip(width=1024, layers=24, heads=16, patch=16,
                       img=512).eval()
    tree = convert_clip_state_dict(
        _clip_style_state_dict(tmodel), target_patch=16, target_img=512)
    jmodel = build_clip(input_resolution=512, patch_size=16, width=1024,
                        layers=24, heads=16, out_indices=(7, 11, 15, 23),
                        attn_impl="xla")

    x = (np.random.RandomState(2).randn(1, 512, 512, 3) * 0.5).astype(
        np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    touts = [touts[i] for i in (7, 11, 15, 23)]
    assert len(jouts) == 4
    worst_abs, worst_rel = _drift(touts, jouts)
    print(f"[fullscale clip-l fp32] max-abs drift {worst_abs:.3e} "
          f"(rel {worst_rel:.3e})")
    # budget: measured 7.6e-6 abs / 1.2e-6 rel (PARITY.md); quick_gelu +
    # the double-added class embedding are exactness-neutral, so this
    # tracks plain fp32 reduction-order noise like DINOv2
    assert worst_abs < 3e-4, worst_abs


# --------------------------------------------------------------------------
# SAM-H
# --------------------------------------------------------------------------

def test_sam_h_full_scale_parity():
    from tools.convert_sam import convert_sam_state_dict

    from vfmseg_tpu.models.backbones.sam import build_sam

    torch.manual_seed(3)
    # pretrain_extent=64 (SAM's 1024^2 pretraining grid): the global
    # blocks' rel-pos tables are [127, 80] and must be resized to the
    # runtime 448^2 grid's 55 rows (sam_vit.py:260-275); windowed blocks
    # carry native window-14 tables (extent 14 -> 27 rows, no resize).
    tmodel = TorchSam(dim=1280, depth=32, heads=16, patch=16, img=448,
                      ws=14, global_idx=(7, 15, 23, 31),
                      pretrain_extent=64).eval()
    tree = convert_sam_state_dict(_sam_style_state_dict(tmodel),
                                  target_img=448)
    jmodel = build_sam(img_size=448, embed_dim=1280, depth=32, num_heads=16,
                       window_size=14, global_attn_indexes=(7, 15, 23, 31),
                       out_indices=(7, 15, 23, 31), pretrain_img_size=1024,
                       attn_impl="xla")

    x = (np.random.RandomState(3).randn(1, 448, 448, 3) * 0.5).astype(
        np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    touts = [touts[i] for i in (7, 15, 23, 31)]
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    assert len(jouts) == 4
    worst_abs, worst_rel = _drift(touts, jouts)
    print(f"[fullscale sam-h fp32] max-abs drift {worst_abs:.3e} "
          f"(rel {worst_rel:.3e})")
    # budget: measured 9.1e-6 abs / 1.0e-6 rel (PARITY.md); 32 blocks +
    # decomposed rel-pos adds (linear table resize exact-matched)
    assert worst_abs < 3e-4, worst_abs
