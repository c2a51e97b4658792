"""Numerical parity: our flax ViT vs an independently-written torch DINOv2
forward, linked by tools/convert_dinov2.py (SURVEY §4a: golden parity vs
reference-architecture activations)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from vfmseg_tpu.models.backbones.dinov2 import build_dinov2  # noqa: E402


class TorchDinoBlock(tnn.Module):
    """Pre-LN ViT block with LayerScale, exact-GELU MLP (DINOv2 semantics)."""

    def __init__(self, dim, heads, init_values=1e-5):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.ls1 = tnn.Parameter(torch.full((dim,), init_values))
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        self.ls2 = tnn.Parameter(torch.full((dim,), init_values))

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.unbind(2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) * (q.shape[-1] ** -0.5)
        out = attn.softmax(-1) @ v
        out = out.transpose(1, 2).reshape(b, n, c)
        x = x + self.ls1 * self.proj(out)
        h = self.norm2(x)
        x = x + self.ls2 * self.fc2(tF.gelu(self.fc1(h)))
        return x


class TorchDinoViT(tnn.Module):
    def __init__(self, dim=32, depth=4, heads=2, patch=16, img=64):
        super().__init__()
        self.patch = patch
        self.patch_embed = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img // patch) ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchDinoBlock(dim, heads) for _ in range(depth)])

    def forward(self, x, out_indices=(0, 1, 2, 3)):
        b = x.shape[0]
        gh, gw = x.shape[2] // self.patch, x.shape[3] // self.patch
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self._pos(gh, gw, x.dtype)
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in out_indices:
                outs.append(
                    x[:, 1:].reshape(b, gh, gw, -1))
        return outs

    def _pos(self, gh, gw, dtype):
        n = self.pos_embed.shape[1] - 1
        side = int(math.sqrt(n))
        if gh == gw and gh * gw == n:
            return self.pos_embed
        grid = self.pos_embed[:, 1:].reshape(1, side, side, -1).permute(0, 3, 1, 2)
        grid = tF.interpolate(
            grid.float(),
            scale_factor=((gh + 0.1) / side, (gw + 0.1) / side),
            mode="bicubic", recompute_scale_factor=False)
        grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        return torch.cat([self.pos_embed[:, :1], grid], 1).to(dtype)


def _torch_state_dict_as_numpy(model):
    """Rename this test model's keys to standard DINOv2 checkpoint naming."""
    import re

    def rename(k):
        if k == "patch_embed.weight":
            return "patch_embed.proj.weight"
        if k == "patch_embed.bias":
            return "patch_embed.proj.bias"
        k = re.sub(r"blocks\.(\d+)\.qkv\.", r"blocks.\1.attn.qkv.", k)
        k = re.sub(r"blocks\.(\d+)\.proj\.", r"blocks.\1.attn.proj.", k)
        k = re.sub(r"blocks\.(\d+)\.fc1\.", r"blocks.\1.mlp.fc1.", k)
        k = re.sub(r"blocks\.(\d+)\.fc2\.", r"blocks.\1.mlp.fc2.", k)
        k = re.sub(r"blocks\.(\d+)\.ls1$", r"blocks.\1.ls1.gamma", k)
        k = re.sub(r"blocks\.(\d+)\.ls2$", r"blocks.\1.ls2.gamma", k)
        return k

    return {rename(k): v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("hw", [(64, 64), (64, 128)])
def test_dinov2_forward_parity(hw):
    torch.manual_seed(0)
    tmodel = TorchDinoViT().eval()
    sd = _torch_state_dict_as_numpy(tmodel)

    from tools.convert_dinov2 import convert_dinov2_state_dict

    tree = convert_dinov2_state_dict(sd, target_patch=16, target_img=64)

    jmodel = build_dinov2(
        patch_size=16, embed_dim=32, depth=4, num_heads=2, img_size=64,
        out_indices=(0, 1, 2, 3), attn_impl="xla")

    x = np.random.RandomState(0).randn(2, *hw, 3).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))

    assert len(touts) == len(jouts)
    for t, j in zip(touts, jouts):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy(), rtol=2e-4, atol=2e-5)


def test_converter_resizes_patch14_to_16():
    torch.manual_seed(1)
    dim = 16
    sd = {
        "cls_token": np.random.randn(1, 1, dim).astype(np.float32),
        "pos_embed": np.random.randn(1, 1 + 9, dim).astype(np.float32),
        "patch_embed.proj.weight": np.random.randn(dim, 3, 14, 14).astype(np.float32),
        "patch_embed.proj.bias": np.random.randn(dim).astype(np.float32),
    }
    from tools.convert_dinov2 import convert_dinov2_state_dict

    tree = convert_dinov2_state_dict(sd, target_patch=16, target_img=64)
    assert tree["patch_embed"]["kernel"].shape == (16, 16, 3, dim)
    assert tree["pos_embed"].shape == (1, 1 + 16, dim)
    # torch-parity of the kernel resize itself
    ref = tF.interpolate(torch.from_numpy(sd["patch_embed.proj.weight"]),
                         size=(16, 16), mode="bicubic", align_corners=False)
    np.testing.assert_allclose(
        tree["patch_embed"]["kernel"].transpose(3, 2, 0, 1), ref.numpy(),
        rtol=1e-3, atol=1e-4)
