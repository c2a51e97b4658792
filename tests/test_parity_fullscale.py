"""Full-scale numerical parity (VERDICT r2 item 2).

The per-family parity tests run at toy dims; these close the gap:
  * ViT-L/16 at REAL dims (1024 embed / 24 blocks / 16 heads, 512^2 input =
    1025 tokens), fp32, vs the inline-torch DINOv2 transcription through
    tools/convert_dinov2 — asserting an explicit error budget over the full
    24-block accumulation (budgets recorded in PARITY.md).
  * the same model bf16 vs fp32 — documents the production-inference drift.
  * the headline MsVFM two-stage gated pipeline at mid scale (embed 256 /
    depth 8) vs an INDEPENDENT torch transcription end-to-end (image ->
    gated slide logits -> argmax), asserting argmax agreement >= 99.9% and
    identical gate decisions (Ms_VFM_encoder_decoder.py:400-466 semantics).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from test_parity_dinov2 import TorchDinoViT, _torch_state_dict_as_numpy  # noqa: E402

from vfmseg_tpu.models.backbones.dinov2 import build_dinov2  # noqa: E402

K = jax.random.PRNGKey


# --------------------------------------------------------------------------
# (a) + (b): ViT-L real dims
# --------------------------------------------------------------------------

VIT_L = dict(dim=1024, depth=24, heads=16, patch=16, img=512)


@pytest.fixture(scope="module")
def vit_l_pair():
    torch.manual_seed(0)
    tmodel = TorchDinoViT(**VIT_L).eval()
    sd = _torch_state_dict_as_numpy(tmodel)

    from tools.convert_dinov2 import convert_dinov2_state_dict

    tree = convert_dinov2_state_dict(sd, target_patch=16, target_img=512)
    x = (np.random.RandomState(0).randn(1, 512, 512, 3) * 0.5).astype(
        np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2),
                       out_indices=(7, 11, 15, 23))
    return tree, x, [t.numpy() for t in touts]


def test_vit_l_fp32_full_scale_parity(vit_l_pair):
    """24 blocks x 1024 dims of fp32 accumulation vs torch: max-abs drift
    must stay inside the recorded budget (PARITY.md)."""
    tree, x, touts = vit_l_pair
    jmodel = build_dinov2(
        patch_size=16, embed_dim=1024, depth=24, num_heads=16, img_size=512,
        out_indices=(7, 11, 15, 23), attn_impl="xla")
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    assert len(jouts) == 4
    worst_abs = worst_rel = 0.0
    for t, j in zip(touts, jouts):
        j = np.asarray(j)
        worst_abs = max(worst_abs, float(np.max(np.abs(j - t))))
        scale = float(np.max(np.abs(t)))
        worst_rel = max(worst_rel, worst_abs / max(scale, 1e-9))
    print(f"[fullscale fp32] max-abs drift {worst_abs:.3e} "
          f"(rel {worst_rel:.3e})")
    # budget: fp32 reduction-order drift through 24 blocks (measured
    # 2.5e-6; PARITY.md)
    assert worst_abs < 5e-5, worst_abs


def test_vit_l_bf16_drift_budget(vit_l_pair):
    """bf16 activations (production inference dtype) vs the fp32 torch
    golden: documents the drift the mIoU claims ride on."""
    tree, x, touts = vit_l_pair
    jmodel = build_dinov2(
        patch_size=16, embed_dim=1024, depth=24, num_heads=16, img_size=512,
        out_indices=(7, 11, 15, 23), attn_impl="xla", dtype=jnp.bfloat16)
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    worst_q = 0.0
    for t, j in zip(touts, jouts):
        err = np.abs(np.asarray(j, np.float32) - t)
        scale = np.quantile(np.abs(t), 0.99)
        q99 = float(np.quantile(err, 0.99)) / max(float(scale), 1e-9)
        worst_q = max(worst_q, q99)
    print(f"[fullscale bf16] q99 relative drift {worst_q:.3e}")
    # budget: bf16 has ~3 decimal digits; 24 blocks of residual accumulation
    # keep the 99th-percentile relative error under 2% (measured 4.5e-3;
    # PARITY.md)
    assert worst_q < 0.02, worst_q


# --------------------------------------------------------------------------
# (c): mid-scale MsVFM end-to-end vs an independent torch transcription
# --------------------------------------------------------------------------

class TorchLinearHead(tnn.Module):
    """Independent transcription of rein/models/heads/linear_head.py:36-70."""

    def __init__(self, c=256, num_classes=19):
        super().__init__()
        self.fusion_conv = tnn.Conv2d(4 * c, c, 1)
        self.fusion_gn = tnn.GroupNorm(32, c)
        self.up1 = tnn.ConvTranspose2d(c, c // 2, 2, 2)
        self.up_bn = tnn.BatchNorm2d(c // 2)
        self.up2 = tnn.ConvTranspose2d(c // 2, c // 4, 2, 2)
        self.conv_seg = tnn.Conv2d(c // 4, num_classes, 1)

    def forward(self, feats):
        x = torch.cat(feats, 1)
        x = tF.relu(self.fusion_gn(self.fusion_conv(x)))
        x = tF.gelu(self.up_bn(self.up1(x)))
        x = tF.gelu(self.up2(x))
        return self.conv_seg(x)


class TorchCrossAttention(tnn.Module):
    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_out = tnn.Linear(inner, query_dim)

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        m = context.shape[1]
        q = self.to_q(x).reshape(b, n, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(context).reshape(b, m, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(context).reshape(b, m, self.heads, self.dim_head).transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)) * (self.dim_head ** -0.5)
        out = attn.softmax(-1) @ v
        return self.to_out(out.transpose(1, 2).reshape(b, n, -1))


class TorchBasicBlock(tnn.Module):
    def __init__(self, dim, heads, dim_head, context_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TorchCrossAttention(dim, None, heads, dim_head)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TorchCrossAttention(dim, context_dim, heads, dim_head)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.geglu = tnn.Linear(dim, dim * 8)
        self.ff_out = tnn.Linear(dim * 4, dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        h, gate = self.geglu(self.norm3(x)).chunk(2, -1)
        return x + self.ff_out(h * tF.gelu(gate))


class TorchVFMHead(tnn.Module):
    """Independent transcription of rein/models/heads/VFMHead.py:28-89 +
    the TransformerDecoder (Transformer.py:228-252), eval mode (no mask)."""

    def __init__(self, c=256, num_classes=19, heads=8, dim_head=32):
        super().__init__()
        self.fuse_conv = tnn.Conv2d(4 * c, c, 1)
        self.fuse_gn = tnn.GroupNorm(32, c)
        self.embed_conv1 = tnn.Conv2d(num_classes, c // 4, 2, 2)
        self.embed_gn1 = tnn.GroupNorm(32, c // 4)
        self.embed_conv2 = tnn.Conv2d(c // 4, c // 2, 2, 2)
        self.embed_gn2 = tnn.GroupNorm(32, c // 2)
        self.embed_conv3 = tnn.Conv2d(c // 2, c, 1)
        self.embed_gn3 = tnn.GroupNorm(32, c)
        self.dec_norm = tnn.GroupNorm(32, c)
        self.block = TorchBasicBlock(c, heads, dim_head, c)
        self.conv_seg = tnn.Conv2d(c, num_classes, 1)

    def forward(self, feats, context_logits):
        gh, gw = feats[0].shape[2], feats[0].shape[3]
        ctx = tF.interpolate(context_logits, size=(gh * 4, gw * 4),
                             mode="bilinear", align_corners=False)
        x = torch.cat(feats, 1)
        img_feats = tF.gelu(self.fuse_gn(self.fuse_conv(x)))
        e = tF.gelu(self.embed_gn1(self.embed_conv1(ctx)))
        e = tF.gelu(self.embed_gn2(self.embed_conv2(e)))
        e = self.embed_gn3(self.embed_conv3(e))
        b, c = img_feats.shape[0], img_feats.shape[1]
        q = self.dec_norm(img_feats).flatten(2).transpose(1, 2)
        kv = e.flatten(2).transpose(1, 2)
        out = self.block(q, kv)
        out = out.transpose(1, 2).reshape(b, c, gh, gw)
        return self.conv_seg(out)


def _conv_tree(m):
    return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": m.bias.detach().numpy()}


def _convT_tree(m):
    # torch ConvTranspose2d weight [in, out, kh, kw] -> flax [kh, kw, in, out]
    # PLUS a spatial flip: flax ConvTranspose does not mirror the kernel the
    # way torch's conv-gradient formulation does (verified empirically)
    k = m.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(k), "bias": m.bias.detach().numpy()}


def _dense_tree(m):
    t = {"kernel": m.weight.detach().numpy().T}
    if m.bias is not None:
        t["bias"] = m.bias.detach().numpy()
    return t


def _norm_tree(m):
    return {"scale": m.weight.detach().numpy(),
            "bias": m.bias.detach().numpy()}


def _attn_tree(m):
    return {"to_q": _dense_tree(m.to_q), "to_k": _dense_tree(m.to_k),
            "to_v": _dense_tree(m.to_v), "to_out": _dense_tree(m.to_out)}


def _build_mid_scale():
    """Torch models + the matching jax MsVFM variables (weights copied
    torch -> flax; forward functions written independently)."""
    from tools.convert_dinov2 import convert_dinov2_state_dict

    from vfmseg_tpu.models.heads.linear_head import LinearHead
    from vfmseg_tpu.models.heads.vfm_head import VFMHead
    from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor

    c, nc, depth, heads = 256, 19, 8, 8
    torch.manual_seed(3)
    tbackbone = TorchDinoViT(dim=c, depth=depth, heads=heads, patch=16,
                             img=128).eval()
    tlin = TorchLinearHead(c, nc).eval()
    tvfm = TorchVFMHead(c, nc, heads=8, dim_head=32).eval()

    backbone_tree = convert_dinov2_state_dict(
        _torch_state_dict_as_numpy(tbackbone), target_patch=16,
        target_img=128)
    lin_tree = {
        "fusion_conv": _conv_tree(tlin.fusion_conv),
        "fusion_gn": _norm_tree(tlin.fusion_gn),
        "up1": _convT_tree(tlin.up1),
        "up_bn": _norm_tree(tlin.up_bn),
        "up2": _convT_tree(tlin.up2),
        "conv_seg": _conv_tree(tlin.conv_seg),
    }
    lin_stats = {"up_bn": {
        "mean": tlin.up_bn.running_mean.detach().numpy(),
        "var": tlin.up_bn.running_var.detach().numpy()}}
    vfm_tree = {
        "fuse_conv": _conv_tree(tvfm.fuse_conv),
        "fuse_gn": _norm_tree(tvfm.fuse_gn),
        "embed_conv1": _conv_tree(tvfm.embed_conv1),
        "embed_gn1": _norm_tree(tvfm.embed_gn1),
        "embed_conv2": _conv_tree(tvfm.embed_conv2),
        "embed_gn2": _norm_tree(tvfm.embed_gn2),
        "embed_conv3": _conv_tree(tvfm.embed_conv3),
        "embed_gn3": _norm_tree(tvfm.embed_gn3),
        "transformer_decoder": {
            "norm": _norm_tree(tvfm.dec_norm),
            "block_0": {
                "norm1": _norm_tree(tvfm.block.norm1),
                "attn1": _attn_tree(tvfm.block.attn1),
                "norm2": _norm_tree(tvfm.block.norm2),
                "attn2": _attn_tree(tvfm.block.attn2),
                "norm3": _norm_tree(tvfm.block.norm3),
                "ff": {"geglu": {"proj": _dense_tree(tvfm.block.geglu)},
                       "out": _dense_tree(tvfm.block.ff_out)},
            },
        },
        "conv_seg": _conv_tree(tvfm.conv_seg),
    }

    jmodel = MsVFMSegmentor(
        backbone=build_dinov2(
            patch_size=16, embed_dim=c, depth=depth, num_heads=heads,
            img_size=128, out_indices=(1, 3, 5, 7), attn_impl="xla"),
        decode_head=LinearHead(in_channels=(c,) * 4, num_classes=nc,
                               dropout_ratio=0.0),
        aux_head=VFMHead(
            transformer=dict(n_heads=8, d_head=32, depth=1, mask_ratio=0.0),
            in_channels=(c,) * 4, channels=c, num_classes=nc,
            dropout_ratio=0.0, attn_impl="xla"),
    )
    variables = {
        "params": {"backbone": backbone_tree, "decode_head": lin_tree,
                   "aux_head": vfm_tree},
        "batch_stats": {"decode_head": lin_stats},
    }
    return (tbackbone, tlin, tvfm), jmodel, variables


def _torch_gated_ms_inference(tmodels, img_t, *, crop, stride, lr_size,
                              threshold, conf, out_indices):
    """Reference gate-loop transcription (Ms_VFM_encoder_decoder.py:400-466)
    running the TORCH modules end-to-end."""
    tbackbone, tlin, tvfm = tmodels
    b, _, h, w = img_t.shape
    ch, cw = crop
    sh, sw = stride

    def lr_fn(x):
        feats = [f.permute(0, 3, 1, 2)
                 for f in tbackbone(x, out_indices=out_indices)]
        logits = tlin(feats)
        return tF.interpolate(logits, size=x.shape[2:], mode="bilinear",
                              align_corners=False)

    def hr_fn(x, ctx):
        feats = [f.permute(0, 3, 1, 2)
                 for f in tbackbone(x, out_indices=out_indices)]
        logits = tvfm(feats, ctx)
        return tF.interpolate(logits, size=x.shape[2:], mode="bilinear",
                              align_corners=False)

    with torch.no_grad():
        stage1 = lr_fn(tF.interpolate(img_t, size=lr_size, mode="bilinear",
                                      align_corners=False))
        full = tF.interpolate(stage1, size=(h, w), mode="bilinear",
                              align_corners=False)
        nc = full.shape[1]
        h_grids = max(h - ch + sh - 1, 0) // sh + 1
        w_grids = max(w - cw + sw - 1, 0) // sw + 1
        preds = torch.zeros((b, nc, h, w))
        count = torch.zeros((b, 1, h, w))
        n_refined = 0
        for hi in range(h_grids):
            for wi in range(w_grids):
                y2, x2 = min(hi * sh + ch, h), min(wi * sw + cw, w)
                y1, x1 = max(y2 - ch, 0), max(x2 - cw, 0)
                ctx = full[:, :, y1:y2, x1:x2]
                probs = ctx.float().softmax(1)
                confidence = float(
                    (probs.max(1).values > threshold).float().mean())
                if confidence < conf:
                    crop_logit = hr_fn(img_t[:, :, y1:y2, x1:x2], ctx)
                    n_refined += 1
                else:
                    crop_logit = ctx
                preds[:, :, y1:y2, x1:x2] += crop_logit
                count[:, :, y1:y2, x1:x2] += 1.0
        assert int((count == 0).sum()) == 0
        return preds / count, n_refined


def test_msvfm_midscale_e2e_argmax_agreement():
    """Image -> gated two-stage slide -> argmax: our batched engine vs the
    torch transcription must agree on >= 99.9% of pixels, with identical
    gate decisions."""
    from vfmseg_tpu.eval.slide import ms_slide_inference
    from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor

    tmodels, jmodel, variables = _build_mid_scale()
    kwargs = dict(crop=(128, 128), stride=(96, 96), lr_size=(128, 256),
                  threshold=0.968, conf=0.8)
    x = (np.random.RandomState(1).randn(1, 256, 512, 3) * 0.4).astype(
        np.float32)

    # Calibrate the classifier scale so the gate exercises BOTH branches:
    # logits are linear in conv_seg (bench.py calibrate_logit_scale), so one
    # torch stage-1 pass yields every candidate's window confidences.
    tbackbone, tlin, tvfm = tmodels
    img_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        feats = [f.permute(0, 3, 1, 2) for f in tbackbone(
            tF.interpolate(img_t, size=kwargs["lr_size"], mode="bilinear",
                           align_corners=False), out_indices=(1, 3, 5, 7))]
        stage1 = tF.interpolate(tlin(feats), size=img_t.shape[2:],
                                mode="bilinear", align_corners=False)

    def skipped_at(s):
        n_skip = 0
        h, w = img_t.shape[2:]
        ch, cw = kwargs["crop"]
        sh, sw = kwargs["stride"]
        for hi in range(max(h - ch + sh - 1, 0) // sh + 1):
            for wi in range(max(w - cw + sw - 1, 0) // sw + 1):
                y2, x2 = min(hi * sh + ch, h), min(wi * sw + cw, w)
                y1, x1 = max(y2 - ch, 0), max(x2 - cw, 0)
                probs = (stage1[:, :, y1:y2, x1:x2].float() * s).softmax(1)
                conf = float(
                    (probs.max(1).values > kwargs["threshold"]).float().mean())
                n_skip += conf >= kwargs["conf"]
        return n_skip

    # window confidences are near-uniform at random weights, so the 0->15
    # transition is sharp — a fine geometric grid catches the mixed region
    scale = next(float(s) for s in np.geomspace(10.0, 1e6, 240)
                 if 1 <= skipped_at(float(s)) <= 13)
    with torch.no_grad():
        tlin.conv_seg.weight.mul_(scale)
        tlin.conv_seg.bias.mul_(scale)
    variables["params"]["decode_head"]["conv_seg"] = _conv_tree(tlin.conv_seg)

    ref_logits, n_refined = _torch_gated_ms_inference(
        tmodels, torch.from_numpy(x).permute(0, 3, 1, 2),
        out_indices=(1, 3, 5, 7), **kwargs)
    n_windows = 3 * 5
    assert 0 < n_refined < n_windows, (
        f"gate must exercise both branches (refined {n_refined}/{n_windows})")

    def lr_fn(im):
        return jmodel.apply(variables, im, method=MsVFMSegmentor.lr_forward)

    def hr_fn(crops, ctx):
        return jmodel.apply(variables, crops, ctx, False, False,
                            method=MsVFMSegmentor.hr_forward)

    ours = ms_slide_inference(lr_fn, hr_fn, jnp.asarray(x), **kwargs)

    ref_map = ref_logits.argmax(1).numpy()[0]
    our_map = np.asarray(jnp.argmax(ours, -1))[0]
    agreement = float((ref_map == our_map).mean())
    print(f"[midscale e2e] argmax agreement {agreement:.5f} "
          f"(gate refined {n_refined}/{n_windows})")
    assert agreement >= 0.999, agreement

    # also check the gated compact engine took the same decisions
    from vfmseg_tpu.eval.compact import CompactMsSlide

    engine = CompactMsSlide(
        lambda v, im: jmodel.apply(v, im, method=MsVFMSegmentor.lr_forward),
        lambda v, cr, ctx: jmodel.apply(v, cr, ctx, False, False,
                                        method=MsVFMSegmentor.hr_forward),
        crop=kwargs["crop"], stride=kwargs["stride"],
        lr_size=kwargs["lr_size"], threshold=kwargs["threshold"],
        conf=kwargs["conf"])
    logits_c, n_c = engine(variables, jnp.asarray(x))
    assert n_c == n_refined
    agree_c = float((np.asarray(jnp.argmax(logits_c, -1))[0] == ref_map).mean())
    assert agree_c >= 0.999, agree_c
