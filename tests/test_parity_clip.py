"""Numerical parity: flax CLIP parameterization vs an inline torch visual
tower (MultiheadAttention, QuickGELU, ln_pre, class-embedding quirks)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from vfmseg_tpu.models.backbones.clip import build_clip  # noqa: E402


class TorchClipBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.c_fc = tnn.Linear(d, d * 4)
        self.c_proj = tnn.Linear(d * 4, d)
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x):  # x: LND
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.ln_2(x)
        h = self.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)
        return x + self.c_proj(h)


class TorchClip(tnn.Module):
    def __init__(self, width=32, layers=4, heads=2, patch=16, img=64):
        super().__init__()
        self.patch = patch
        self.spatial = img // patch
        self.conv1 = tnn.Conv2d(3, width, patch, patch, bias=False)
        scale = width**-0.5
        self.class_embedding = tnn.Parameter(scale * torch.randn(width))
        self.positional_embedding = tnn.Parameter(
            scale * torch.randn(self.spatial**2 + 1, width))
        self.ln_pre = tnn.LayerNorm(width)
        self.blocks = tnn.ModuleList(
            [TorchClipBlock(width, heads) for _ in range(layers)])

    def forward(self, x):
        x = self.conv1(x)
        b, c, h, w = x.shape
        x = x.reshape(b, c, -1).permute(0, 2, 1)
        x = torch.cat(
            [self.class_embedding + torch.zeros(b, 1, c), x], dim=1)
        pos = self.positional_embedding
        cls_pos = (pos[0] + self.class_embedding).reshape(1, 1, c)
        spatial = pos[1:].reshape(1, self.spatial, self.spatial, c).permute(0, 3, 1, 2)
        spatial = tF.interpolate(spatial, size=(h, w), mode="bilinear")
        spatial = spatial.reshape(1, c, h * w).permute(0, 2, 1)
        x = x + torch.cat([cls_pos, spatial], dim=1)
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)  # LND
        outs = []
        for blk in self.blocks:
            x = blk(x)
            outs.append(x.permute(1, 0, 2)[:, 1:].reshape(b, h, w, c))
        return outs


def _clip_style_state_dict(model):
    import re

    def rename(k):
        k = re.sub(r"^blocks\.(\d+)\.", r"transformer.resblocks.\1.", k)
        k = k.replace(".c_fc.", ".mlp.c_fc.").replace(".c_proj.", ".mlp.c_proj.")
        return k

    return {rename(k): v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("hw", [(64, 64), (64, 128)])
def test_clip_forward_parity(hw):
    torch.manual_seed(0)
    tmodel = TorchClip().eval()
    sd = _clip_style_state_dict(tmodel)

    from tools.convert_clip import convert_clip_state_dict

    tree = convert_clip_state_dict(sd, target_patch=16, target_img=64)

    jmodel = build_clip(input_resolution=64, patch_size=16, width=32, layers=4,
                        heads=2, out_indices=(0, 1, 2, 3), attn_impl="xla")

    x = np.random.RandomState(0).randn(2, *hw, 3).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    jouts = jmodel.apply({"params": tree}, jnp.asarray(x))
    for t, j in zip(touts, jouts):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=3e-4, atol=3e-5)


def test_clip_lora_target_normalization():
    from vfmseg_tpu.models.backbones.clip import normalize_lora_targets

    assert normalize_lora_targets(["out_proj", "mlp.c_fc", "mlp.c_proj"]) == (
        "proj", "fc1", "fc2")
    assert normalize_lora_targets(["q_proj", "attn.proj"]) == ("q_proj", "proj")
