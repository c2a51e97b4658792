"""Numerical parity: flax EVA02 parameterization vs an inline torch model
(split q/k/v with k bias-free, 2D axial RoPE, SwiGLU with sub-LN)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from vfmseg_tpu.models.backbones.eva02 import build_eva02  # noqa: E402
from vfmseg_tpu.ops.rope import rope_2d_tables  # noqa: E402


def torch_rope_tables(gh, gw, head_dim, pt=4):
    cos, sin = rope_2d_tables(gh, gw, head_dim, pt_seq_len=pt, intp_freq=True)
    return torch.from_numpy(cos), torch.from_numpy(sin)


def t_rotate_half(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return torch.stack([-x2, x1], dim=-1).reshape(x.shape)


class TorchEvaBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.q_proj = tnn.Linear(dim, dim, bias=True)
        self.k_proj = tnn.Linear(dim, dim, bias=False)
        self.v_proj = tnn.Linear(dim, dim, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        hidden = int(dim * 4 * 2 / 3)
        self.w1 = tnn.Linear(dim, hidden)
        self.w2 = tnn.Linear(dim, hidden)
        self.ffn_ln = tnn.LayerNorm(hidden, eps=1e-6)
        self.w3 = tnn.Linear(hidden, dim)

    def forward(self, x, cos, sin):
        b, n, c = x.shape
        hd = c // self.heads
        h = self.norm1(x)
        q = self.q_proj(h).reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)
        k = self.k_proj(h).reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)
        v = self.v_proj(h).reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)

        def rot(t):
            tp = t[:, :, 1:]
            tp = tp * cos + t_rotate_half(tp) * sin
            return torch.cat([t[:, :, :1], tp], dim=2)

        q, k = rot(q), rot(k)
        attn = (q @ k.transpose(-2, -1)) * (hd**-0.5)
        out = attn.softmax(-1) @ v
        out = out.transpose(1, 2).reshape(b, n, c)
        x = x + self.proj(out)
        h = self.norm2(x)
        x = x + self.w3(self.ffn_ln(tF.silu(self.w1(h)) * self.w2(h)))
        return x


class TorchEva(tnn.Module):
    def __init__(self, dim=32, depth=4, heads=2, patch=16, img=64):
        super().__init__()
        self.patch = patch
        self.patch_embed = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img // patch) ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchEvaBlock(dim, heads) for _ in range(depth)])
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        b = x.shape[0]
        gh, gw = x.shape[2] // self.patch, x.shape[3] // self.patch
        cos, sin = torch_rope_tables(gh, gw, self.dim // self.heads, pt=4)
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        outs = []
        for blk in self.blocks:
            x = blk(x, cos, sin)
            outs.append(x[:, 1:].reshape(b, gh, gw, -1))
        return outs


def _state_dict_eva_names(model):
    import re

    def rename(k):
        if k == "patch_embed.weight":
            return "patch_embed.proj.weight"
        if k == "patch_embed.bias":
            return "patch_embed.proj.bias"
        k = re.sub(r"blocks\.(\d+)\.q_proj\.weight", r"blocks.\1.attn.q_proj.weight", k)
        k = re.sub(r"blocks\.(\d+)\.k_proj\.weight", r"blocks.\1.attn.k_proj.weight", k)
        k = re.sub(r"blocks\.(\d+)\.v_proj\.weight", r"blocks.\1.attn.v_proj.weight", k)
        k = re.sub(r"blocks\.(\d+)\.q_proj\.bias", r"blocks.\1.attn.q_bias", k)
        k = re.sub(r"blocks\.(\d+)\.v_proj\.bias", r"blocks.\1.attn.v_bias", k)
        k = re.sub(r"blocks\.(\d+)\.proj\.", r"blocks.\1.attn.proj.", k)
        k = re.sub(r"blocks\.(\d+)\.(w1|w2|w3|ffn_ln)\.", r"blocks.\1.mlp.\2.", k)
        return k

    return {rename(k): v.detach().numpy() for k, v in model.state_dict().items()}


def test_eva02_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchEva().eval()
    sd = _state_dict_eva_names(tmodel)

    from tools.convert_eva2 import convert_eva02_state_dict

    tree = convert_eva02_state_dict(sd, target_patch=16, target_img=64)

    jmodel = build_eva02(
        patch_size=16, embed_dim=32, depth=4, num_heads=2, img_size=64,
        out_indices=(0, 1, 2, 3), pt_hw_seq_len=4, attn_impl="xla")

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).transpose(3, 2).transpose(2, 1))
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    for t, j in zip(touts, jouts):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=2e-4, atol=2e-5)


def test_rope_tables_shape_and_identity():
    cos, sin = rope_2d_tables(4, 4, 16, pt_seq_len=4)
    assert cos.shape == (16, 16) and sin.shape == (16, 16)
    # position (0,0) => zero angle => cos 1, sin 0
    np.testing.assert_allclose(cos[0], 1.0, atol=1e-7)
    np.testing.assert_allclose(sin[0], 0.0, atol=1e-7)


def test_rotate_half_mxu_exact():
    """The MXU signed-permutation rotate_half must equal the strided
    formulation bit-exactly (entries are +-1; no accumulation)."""
    from vfmseg_tpu.ops.rope import rotate_half, rotate_half_mxu

    x = jnp.asarray(np.random.RandomState(3).randn(2, 5, 7, 64),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(rotate_half_mxu(x)),
                                  np.asarray(rotate_half(x)))
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(rotate_half_mxu(xb)).astype(np.float32),
        np.asarray(rotate_half(xb)).astype(np.float32))
