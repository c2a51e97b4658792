"""Numerical parity: flax SAM parameterization vs an inline torch ViTDet
model (window attention + decomposed rel-pos, no cls token)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from vfmseg_tpu.models.backbones.sam import build_sam  # noqa: E402


def t_window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = tF.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp)


def t_window_unpartition(x, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.view(b, hp // ws, wp // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)[:, :h, :w]


def t_get_rel_pos(q, k, rel):
    m = 2 * max(q, k) - 1
    if rel.shape[0] != m:
        rel = tF.interpolate(rel.reshape(1, rel.shape[0], -1).permute(0, 2, 1),
                             size=m, mode="linear")
        rel = rel.reshape(-1, m).permute(1, 0)
    qc = torch.arange(q)[:, None] * max(k / q, 1.0)
    kc = torch.arange(k)[None, :] * max(q / k, 1.0)
    idx = (qc - kc) + (k - 1) * max(q / k, 1.0)
    return rel[idx.long()]


class TorchSamAttn(tnn.Module):
    def __init__(self, dim, heads, extent):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        hd = dim // heads
        self.rel_pos_h = tnn.Parameter(torch.randn(2 * extent - 1, hd) * 0.1)
        self.rel_pos_w = tnn.Parameter(torch.randn(2 * extent - 1, hd) * 0.1)

    def forward(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(b, h * w, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * self.heads, h * w, hd).unbind(0)
        attn = (q * hd**-0.5) @ k.transpose(-2, -1)
        rh = t_get_rel_pos(h, h, self.rel_pos_h)
        rw = t_get_rel_pos(w, w, self.rel_pos_w)
        rq = q.reshape(b * self.heads, h, w, hd)
        rel_h = torch.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = (attn.view(b * self.heads, h, w, h, w)
                + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
                ).view(b * self.heads, h * w, h * w)
        out = attn.softmax(-1) @ v
        out = out.view(b, self.heads, h, w, hd).permute(0, 2, 3, 1, 4).reshape(b, h, w, c)
        return self.proj(out)


class TorchSamBlock(tnn.Module):
    def __init__(self, dim, heads, ws, extent):
        super().__init__()
        self.ws = ws
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchSamAttn(dim, heads, ws if ws else extent)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.lin1 = tnn.Linear(dim, dim * 4)
        self.lin2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):  # [B, H, W, C]
        shortcut = x
        x = self.norm1(x)
        if self.ws:
            h, w = x.shape[1], x.shape[2]
            x, pad = t_window_partition(x, self.ws)
        x = self.attn(x)
        if self.ws:
            x = t_window_unpartition(x, self.ws, pad, (h, w))
        x = shortcut + x
        return x + self.lin2(tF.gelu(self.lin1(self.norm2(x))))


class TorchSam(tnn.Module):
    def __init__(self, dim=32, depth=4, heads=2, patch=16, img=64, ws=2,
                 global_idx=(1, 3), pretrain_extent=8):
        super().__init__()
        self.patch = patch
        self.proj = tnn.Conv2d(3, dim, patch, patch)
        side = img // patch
        self.pos_embed = tnn.Parameter(torch.randn(1, side, side, dim) * 0.02)
        self.blocks = tnn.ModuleList([
            TorchSamBlock(dim, heads, 0 if i in global_idx else ws,
                          pretrain_extent)
            for i in range(depth)])

    def forward(self, x):
        x = self.proj(x).permute(0, 2, 3, 1)  # [B, H, W, C]
        x = x + self.pos_embed
        outs = []
        for blk in self.blocks:
            x = blk(x)
            outs.append(x)
        return outs


def _sam_style_state_dict(model):
    import re

    def rename(k):
        if k == "proj.weight":
            return "patch_embed.proj.weight"
        if k == "proj.bias":
            return "patch_embed.proj.bias"
        k = re.sub(r"blocks\.(\d+)\.attn\.", r"blocks.\1.attn.", k)
        k = re.sub(r"blocks\.(\d+)\.lin1\.", r"blocks.\1.mlp.lin1.", k)
        k = re.sub(r"blocks\.(\d+)\.lin2\.", r"blocks.\1.mlp.lin2.", k)
        return k

    return {rename(k): v.detach().numpy() for k, v in model.state_dict().items()}


def test_sam_forward_parity():
    torch.manual_seed(0)
    # pretrain_extent=8 != runtime grid 4 => exercises rel-pos runtime resize
    tmodel = TorchSam().eval()
    sd = _sam_style_state_dict(tmodel)

    from tools.convert_sam import convert_sam_state_dict

    tree = convert_sam_state_dict(sd, target_img=64)

    jmodel = build_sam(img_size=64, embed_dim=32, depth=4, num_heads=2,
                       window_size=2, global_attn_indexes=(1, 3),
                       out_indices=(0, 1, 2, 3), pretrain_img_size=128,
                       attn_impl="xla")

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    for t, j in zip(touts, jouts):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=3e-4, atol=3e-5)


def test_sam_forward_parity_with_window_padding():
    """Grid 5 with window 2 -> padded 6x6 windows: exercises the persisted-
    window pad re-zeroing (vit.py window-segment persistence) against the
    reference's per-block zero-padding semantics."""
    torch.manual_seed(1)
    tmodel = TorchSam(img=80).eval()
    sd = _sam_style_state_dict(tmodel)

    from tools.convert_sam import convert_sam_state_dict

    tree = convert_sam_state_dict(sd, target_img=80)

    jmodel = build_sam(img_size=80, embed_dim=32, depth=4, num_heads=2,
                       window_size=2, global_attn_indexes=(1, 3),
                       out_indices=(0, 1, 2, 3), pretrain_img_size=128,
                       attn_impl="xla")

    x = np.random.RandomState(1).randn(2, 80, 80, 3).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    for t, j in zip(touts, jouts):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=3e-4,
                                   atol=3e-5)


def test_window_partition_roundtrip():
    import jax

    from vfmseg_tpu.ops.window import window_partition, window_unpartition

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 9, 4))
    wins, pad_hw = window_partition(x, 3)
    assert wins.shape == (2 * 3 * 3, 3, 3, 4)
    back = window_unpartition(wins, 3, pad_hw, (7, 9))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
