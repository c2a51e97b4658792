"""Numerical parity: our flax MixVisionTransformer vs an independently
written torch MiT (official-SegFormer semantics), linked by
tools/convert_mit.py — guards loading mmseg's pretrained mit_b5
(the reference's daformer bases, daformer_conv1_mitb5.py:15)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from vfmseg_tpu.models.backbones.mit import MixVisionTransformer  # noqa: E402


class TorchMiTAttn(tnn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.heads = heads
        self.sr_ratio = sr
        self.q = tnn.Linear(dim, dim)
        self.kv = tnn.Linear(dim, dim * 2)
        self.proj = tnn.Linear(dim, dim)
        if sr > 1:
            self.sr = tnn.Conv2d(dim, dim, sr, sr)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, h, w):
        b, n, c = x.shape
        hd = c // self.heads
        q = self.q(x).reshape(b, n, self.heads, hd).transpose(1, 2)
        src = x
        if self.sr_ratio > 1:
            src = x.transpose(1, 2).reshape(b, c, h, w)
            src = self.sr(src).reshape(b, c, -1).transpose(1, 2)
            src = self.norm(src)
        kv = self.kv(src).reshape(b, -1, 2, self.heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
        out = attn.softmax(-1) @ v
        out = out.transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TorchMixFFN(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)

        class DW(tnn.Module):
            def __init__(self, ch):
                super().__init__()
                self.dwconv = tnn.Conv2d(ch, ch, 3, 1, 1, groups=ch)

            def forward(self, x, h, w):
                b, n, c = x.shape
                x = x.transpose(1, 2).reshape(b, c, h, w)
                x = self.dwconv(x)
                return x.flatten(2).transpose(1, 2)

        self.dwconv = DW(hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x, h, w):
        return self.fc2(tF.gelu(self.dwconv(self.fc1(x), h, w)))


class TorchMiTBlock(tnn.Module):
    def __init__(self, dim, heads, sr, mlp_ratio=4):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchMiTAttn(dim, heads, sr)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMixFFN(dim, dim * mlp_ratio)

    def forward(self, x, h, w):
        x = x + self.attn(self.norm1(x), h, w)
        return x + self.mlp(self.norm2(x), h, w)


class TorchMiT(tnn.Module):
    """mit_bN skeleton with official-SegFormer key names (converter input)."""

    def __init__(self, dims=(8, 16, 32, 64), depths=(1, 2, 2, 1),
                 heads=(1, 2, 2, 2), srs=(4, 2, 1, 1)):
        super().__init__()
        self.dims, self.depths, self.srs = dims, depths, srs
        for i in range(4):
            inc = 3 if i == 0 else dims[i - 1]
            k, s, p = (7, 4, 3) if i == 0 else (3, 2, 1)

            class PE(tnn.Module):
                def __init__(self, inc, outc, k, s, p):
                    super().__init__()
                    self.proj = tnn.Conv2d(inc, outc, k, s, p)
                    self.norm = tnn.LayerNorm(outc, eps=1e-6)

            setattr(self, f"patch_embed{i + 1}", PE(inc, dims[i], k, s, p))
            setattr(self, f"block{i + 1}", tnn.ModuleList(
                [TorchMiTBlock(dims[i], heads[i], srs[i])
                 for _ in range(depths[i])]))
            setattr(self, f"norm{i + 1}", tnn.LayerNorm(dims[i], eps=1e-6))

    def forward(self, x):
        feats = []
        for i in range(4):
            pe = getattr(self, f"patch_embed{i + 1}")
            x = pe.proj(x)
            b, c, h, w = x.shape
            x = x.flatten(2).transpose(1, 2)
            x = pe.norm(x)
            for blk in getattr(self, f"block{i + 1}"):
                x = blk(x, h, w)
            x = getattr(self, f"norm{i + 1}")(x)
            feats.append(x.reshape(b, h, w, c))
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return feats


def test_mit_matches_torch_via_converter():
    torch.manual_seed(0)
    tm = TorchMiT().eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = [f.numpy() for f in tm(x)]

    from tools.convert_mit import convert

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert(state)

    model = MixVisionTransformer(
        embed_dims=(8, 16, 32, 64), depths=(1, 2, 2, 1),
        num_heads=(1, 2, 2, 2), sr_ratios=(4, 2, 1, 1), drop_path_rate=0.0,
        attn_impl="xla")
    ours = model.apply({"params": params},
                       jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(ours) == 4
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-4, atol=2e-4)
