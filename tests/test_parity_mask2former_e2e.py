"""Mid-scale e2e parity for the Rein+Mask2Former flagship (VERDICT r3
item 6): image -> Rein-DINOv2 backbone (per-block token adapters + query
vector) -> MSDeformAttn pixel decoder -> masked transformer decoder ->
semantic inference, vs an INDEPENDENT torch transcription of the mmdet/mmcv
semantics the reference configures:

  * rein/models/heads/rein_mask2former.py:23-97 (rein queries as positional
    query, no learned query_embed)
  * mmdet MSDeformAttnPixelDecoder (6 deformable encoder layers over the 3
    lowest-res maps, FPN lateral, level encodings, sine positional encoding)
  * mmcv MultiScaleDeformableAttention (grid_sample align_corners=False,
    zero padding, softmax over levels*points, spoke bias init)
  * mmdet Mask2FormerTransformerDecoder (masked cross-attn -> self-attn ->
    FFN post-norm, attention mask from sigmoid(mask)<0.5 with all-masked
    rows reset, level cycling)
  * rein/models/backbones/reins.py:61-116 (token-bank adapter + return_auto
    queries)

Mid scale: backbone dim 256 / depth 4 with Reins after every block; head
embed 256, 100 queries, 3 levels, 3 decoder layers; image 256x512. Weights
are copied torch -> flax leaf by leaf; the forward math is written twice.

The torch side computes decoder attention masks the mmdet way (full-res
mask einsum + bilinear resize per stage); ours forms them at level
resolution against pre-resized mask features (documented resize/einsum
commutation, mask2former.py "Inference" note) — so this test also validates
that optimization end-to-end.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from test_parity_dinov2 import TorchDinoViT, _torch_state_dict_as_numpy  # noqa: E402
from test_parity_fullscale import _conv_tree, _dense_tree, _norm_tree  # noqa: E402

C = 256          # embed / feat channels
NQ = 100         # queries
HEADS = 8
LEVELS = 3
POINTS = 4
ENC_LAYERS = 6   # our MSDeformAttnPixelDecoder default
DEC_LAYERS = 3
NUM_CLASSES = 19


# --------------------------------------------------------------------------
# torch transcription
# --------------------------------------------------------------------------

def t_sine_pos(h, w, num_feats=C // 2, temperature=10000.0):
    """mmdet SinePositionalEncoding(normalize=True), cumsum formulation."""
    eps, scale = 1e-6, 2 * math.pi
    mask = torch.ones(1, h, w)
    y_embed = mask.cumsum(1)
    x_embed = mask.cumsum(2)
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = temperature ** (
        2 * (torch.arange(num_feats) // 2) / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack(
        (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()),
        dim=4).view(1, h, w, -1)
    pos_y = torch.stack(
        (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()),
        dim=4).view(1, h, w, -1)
    return torch.cat((pos_y, pos_x), dim=3).view(1, h * w, 2 * num_feats)


class TorchReins(tnn.Module):
    """reins.py:84-116 + return_auto (:61-75)."""

    def __init__(self, num_layers, dims, patch=16, token_length=NQ,
                 query_dims=C):
        super().__init__()
        val = math.sqrt(6.0 / (3 * patch**2 + dims))
        self.learnable_tokens = tnn.Parameter(
            torch.empty(num_layers, token_length, dims).uniform_(-val, val))
        self.scale = tnn.Parameter(torch.tensor(0.001))
        self.mlp_token2feat = tnn.Linear(dims, dims)
        self.mlp_delta_f = tnn.Linear(dims, dims)
        self.transform = tnn.Linear(dims, query_dims)
        self.merge = tnn.Linear(3 * query_dims, query_dims)
        self.dims = dims

    def adapt(self, feats, layer):
        """feats [B, N, C] with 1 leading cls token that bypasses."""
        prefix, x = feats[:, :1], feats[:, 1:]
        tokens = self.learnable_tokens[layer]
        attn = torch.einsum("bnc,mc->bnm", x, tokens)
        attn = tF.softmax(attn * self.dims**-0.5, dim=-1)
        delta = torch.einsum("bnm,mc->bnc", attn[:, :, 1:],
                             self.mlp_token2feat(tokens[1:]))
        delta = self.mlp_delta_f(delta + x)
        return torch.cat([prefix, x + self.scale * delta], dim=1)

    def queries(self):
        tokens = self.transform(self.learnable_tokens)   # [L, T, Q]
        pooled = torch.cat(
            [tokens.max(0).values, tokens.mean(0), tokens[-1]], dim=-1)
        return self.merge(pooled)                        # [T, Q]


class TorchReinDino(tnn.Module):
    """TorchDinoViT blocks with a shared Reins adapter after every block
    (reins_dinov2.py:22-34; features collected post-adapt)."""

    def __init__(self, dim, depth, heads, img):
        super().__init__()
        self.vit = TorchDinoViT(dim=dim, depth=depth, heads=heads, patch=16,
                                img=img)
        self.reins = TorchReins(depth, dim)

    def forward(self, x, out_indices):
        b = x.shape[0]
        gh, gw = x.shape[2] // 16, x.shape[3] // 16
        v = self.vit
        x = v.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([v.cls_token.expand(b, -1, -1), x], 1)
        x = x + v._pos(gh, gw, x.dtype)
        outs = []
        for i, blk in enumerate(v.blocks):
            x = blk(x)
            x = self.reins.adapt(x, i)
            if i in out_indices:
                outs.append(x[:, 1:].reshape(b, gh, gw, -1).permute(0, 3, 1, 2))
        return outs, self.reins.queries()


class TorchMSDeformAttn(tnn.Module):
    """mmcv MultiScaleDeformableAttention via grid_sample."""

    def __init__(self):
        super().__init__()
        self.value_proj = tnn.Linear(C, C)
        self.sampling_offsets = tnn.Linear(C, HEADS * LEVELS * POINTS * 2)
        self.attention_weights = tnn.Linear(C, HEADS * LEVELS * POINTS)
        self.output_proj = tnn.Linear(C, C)
        # mmcv spoke init
        with torch.no_grad():
            self.sampling_offsets.weight.zero_()
            thetas = torch.arange(HEADS) * (2 * math.pi / HEADS)
            grid = torch.stack([thetas.cos(), thetas.sin()], -1)
            grid = (grid / grid.abs().max(-1, keepdim=True).values
                    ).view(HEADS, 1, 1, 2).repeat(1, LEVELS, POINTS, 1)
            for i in range(POINTS):
                grid[:, :, i, :] *= i + 1
            self.sampling_offsets.bias.copy_(grid.view(-1))
            self.attention_weights.weight.zero_()
            self.attention_weights.bias.zero_()

    def forward(self, query, value_list, ref):
        """query [B, Nq, C]; value_list per level [B, H, W, C] (channels
        last); ref [Nq, 2] normalized (x, y)."""
        b, nq, _ = query.shape
        d = C // HEADS
        off = self.sampling_offsets(query).view(
            b, nq, HEADS, LEVELS, POINTS, 2)
        attn = self.attention_weights(query).view(
            b, nq, HEADS, LEVELS * POINTS)
        attn = attn.softmax(-1).view(b, nq, HEADS, LEVELS, POINTS)
        out = 0
        for lvl, v in enumerate(value_list):
            h, w = v.shape[1], v.shape[2]
            pv = self.value_proj(v.reshape(b, h * w, C)).view(
                b, h, w, HEADS, d)
            norm = torch.tensor([w, h], dtype=torch.float32)
            loc = ref[None, :, None, None, :] + off[:, :, :, lvl] / norm
            grid = 2 * loc - 1                            # [B, Nq, H8, P, 2]
            vv = pv.permute(0, 3, 4, 1, 2).reshape(b * HEADS, d, h, w)
            g = grid.permute(0, 2, 1, 3, 4).reshape(b * HEADS, nq, POINTS, 2)
            samp = tF.grid_sample(vv, g, mode="bilinear",
                                  padding_mode="zeros", align_corners=False)
            wts = attn[:, :, :, lvl].permute(0, 2, 1, 3).reshape(
                b * HEADS, 1, nq, POINTS)
            out = out + (samp * wts).sum(-1)              # [B*H8, d, Nq]
        out = out.view(b, HEADS, d, nq).permute(0, 3, 1, 2).reshape(b, nq, C)
        return self.output_proj(out)


class TorchEncLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = TorchMSDeformAttn()
        self.norm1 = tnn.LayerNorm(C, eps=1e-5)
        self.fc1 = tnn.Linear(C, 1024)
        self.fc2 = tnn.Linear(1024, C)
        self.norm2 = tnn.LayerNorm(C, eps=1e-5)

    def forward(self, x, pos, shapes, ref):
        vals = []
        start = 0
        for (h, w) in shapes:
            vals.append(x[:, start:start + h * w].view(-1, h, w, C))
            start += h * w
        x = self.norm1(x + self.self_attn(x + pos, vals, ref))
        return self.norm2(x + self.fc2(tF.relu(self.fc1(x))))


class TorchPixelDecoder(tnn.Module):
    """mmdet MSDeformAttnPixelDecoder (bias on input convs to match our
    nn.Conv defaults; weights are copied so numerics line up either way)."""

    def __init__(self, in_c):
        super().__init__()
        self.input_convs = tnn.ModuleList(
            [tnn.Conv2d(in_c, C, 1) for _ in range(LEVELS)])
        self.input_gns = tnn.ModuleList(
            [tnn.GroupNorm(32, C) for _ in range(LEVELS)])
        self.level_embed = tnn.Parameter(torch.randn(LEVELS, C))
        self.layers = tnn.ModuleList(
            [TorchEncLayer() for _ in range(ENC_LAYERS)])
        self.lateral_conv = tnn.Conv2d(in_c, C, 1, bias=False)
        self.lateral_gn = tnn.GroupNorm(32, C)
        self.output_conv = tnn.Conv2d(C, C, 3, padding=1, bias=False)
        self.output_gn = tnn.GroupNorm(32, C)
        self.mask_feature = tnn.Conv2d(C, C, 1)

    def forward(self, feats):
        """feats: 4 NCHW maps high->low res."""
        enc = [feats[3], feats[2], feats[1]]
        b = feats[0].shape[0]
        tokens, poses, shapes, refs = [], [], [], []
        for i, f in enumerate(enc):
            x = self.input_gns[i](self.input_convs[i](f))
            h, w = x.shape[2], x.shape[3]
            shapes.append((h, w))
            tokens.append(x.flatten(2).transpose(1, 2))
            poses.append(t_sine_pos(h, w) + self.level_embed[i][None, None])
            ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
            xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            refs.append(torch.stack([gx, gy], -1).view(h * w, 2))
        x = torch.cat(tokens, 1)
        pos = torch.cat(poses, 1).expand(b, -1, -1)
        ref = torch.cat(refs, 0)
        for layer in self.layers:
            x = layer(x, pos, shapes, ref)
        memories = []
        start = 0
        for (h, w) in shapes:
            memories.append(x[:, start:start + h * w].transpose(1, 2).view(
                b, C, h, w))
            start += h * w
        lat = self.lateral_gn(self.lateral_conv(feats[0]))
        up = tF.interpolate(memories[-1], size=lat.shape[2:],
                            mode="bilinear", align_corners=False)
        y = tF.relu(self.output_gn(self.output_conv(lat + up)))
        return self.mask_feature(y), memories


class TorchDecLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.cross_attn = tnn.MultiheadAttention(C, HEADS, batch_first=True)
        self.norm1 = tnn.LayerNorm(C, eps=1e-5)
        self.self_attn = tnn.MultiheadAttention(C, HEADS, batch_first=True)
        self.norm2 = tnn.LayerNorm(C, eps=1e-5)
        self.fc1 = tnn.Linear(C, 2048)
        self.fc2 = tnn.Linear(2048, C)
        self.norm3 = tnn.LayerNorm(C, eps=1e-5)

    def forward(self, q, k, qpos, kpos, attn_mask):
        x, _ = self.cross_attn(q + qpos, k + kpos, k, attn_mask=attn_mask,
                               need_weights=False)
        q = self.norm1(q + x)
        x, _ = self.self_attn(q + qpos, q + qpos, q, need_weights=False)
        q = self.norm2(q + x)
        return self.norm3(q + self.fc2(tF.relu(self.fc1(q))))


class TorchM2FHead(tnn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.pixel_decoder = TorchPixelDecoder(in_c)
        self.level_embed = tnn.Parameter(torch.randn(LEVELS, C))
        self.query_feat = tnn.Parameter(torch.randn(NQ, C))
        self.layers = tnn.ModuleList(
            [TorchDecLayer() for _ in range(DEC_LAYERS)])
        self.decoder_norm = tnn.LayerNorm(C, eps=1e-5)
        self.cls_embed = tnn.Linear(C, NUM_CLASSES + 1)
        self.mask_fc0 = tnn.Linear(C, C)
        self.mask_fc1 = tnn.Linear(C, C)
        self.mask_fc2 = tnn.Linear(C, C)

    def mask_embed(self, x):
        return self.mask_fc2(tF.relu(self.mask_fc1(tF.relu(self.mask_fc0(x)))))

    def forward_head(self, qf, mask_features, target_hw):
        """mmdet order: full-res mask einsum, then resize to the next
        level's resolution for the attention mask."""
        out = self.decoder_norm(qf)
        cls_pred = self.cls_embed(out)
        membed = self.mask_embed(out)
        mask_pred = torch.einsum("bqc,bchw->bqhw", membed, mask_features)
        am = tF.interpolate(mask_pred, size=target_hw, mode="bilinear",
                            align_corners=False)
        am = (am.sigmoid() < 0.5).flatten(2)             # [B, Nq, N]
        all_true = am.all(-1, keepdim=True)
        am = am & ~all_true
        b = am.shape[0]
        am = am[:, None].expand(b, HEADS, NQ, am.shape[-1]).reshape(
            b * HEADS, NQ, -1)
        return cls_pred, mask_pred, am

    def forward(self, feats, rein_queries):
        b = feats[0].shape[0]
        mask_features, memories = self.pixel_decoder(feats)
        dec_in, dec_pos, shapes = [], [], []
        for i, m in enumerate(memories):
            h, w = m.shape[2], m.shape[3]
            shapes.append((h, w))
            dec_in.append(m.flatten(2).transpose(1, 2)
                          + self.level_embed[i][None, None])
            dec_pos.append(t_sine_pos(h, w).expand(b, -1, -1))
        qpos = rein_queries[None].expand(b, -1, -1)
        qf = self.query_feat[None].expand(b, -1, -1)
        _, _, attn_mask = self.forward_head(qf, mask_features, shapes[0])
        for i, layer in enumerate(self.layers):
            lvl = i % LEVELS
            qf = layer(qf, dec_in[lvl], qpos, dec_pos[lvl], attn_mask)
            if i + 1 < DEC_LAYERS:
                _, _, attn_mask = self.forward_head(
                    qf, mask_features, shapes[(i + 1) % LEVELS])
        out = self.decoder_norm(qf)
        cls_pred = self.cls_embed(out)
        mask_pred = torch.einsum("bqc,bchw->bqhw", self.mask_embed(out),
                                 mask_features)
        probs = cls_pred.softmax(-1)[..., :NUM_CLASSES]
        masks = mask_pred.sigmoid()
        return torch.einsum("bqc,bqhw->bhwc", probs, masks)


# --------------------------------------------------------------------------
# torch -> flax weight trees
# --------------------------------------------------------------------------

def _mha_tree(m):
    return {
        "in_proj_kernel": m.in_proj_weight.detach().numpy().T,
        "in_proj_bias": m.in_proj_bias.detach().numpy(),
        "out_proj": _dense_tree(m.out_proj),
    }


def _deform_tree(m):
    return {
        "value_proj": _dense_tree(m.value_proj),
        "sampling_offsets": _dense_tree(m.sampling_offsets),
        "attention_weights": _dense_tree(m.attention_weights),
        "output_proj": _dense_tree(m.output_proj),
    }


def _enc_layer_tree(m):
    return {
        "self_attn": _deform_tree(m.self_attn),
        "norm1": _norm_tree(m.norm1),
        "norm2": _norm_tree(m.norm2),
        "ffn": {"fc1": _dense_tree(m.fc1), "fc2": _dense_tree(m.fc2)},
    }


def _dec_layer_tree(m):
    return {
        "cross_attn": _mha_tree(m.cross_attn),
        "self_attn": _mha_tree(m.self_attn),
        "norm1": _norm_tree(m.norm1),
        "norm2": _norm_tree(m.norm2),
        "norm3": _norm_tree(m.norm3),
        "ffn": {"fc1": _dense_tree(m.fc1), "fc2": _dense_tree(m.fc2)},
    }


def _conv_tree_nobias(m):
    return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}


def _head_tree(t):
    pd = t.pixel_decoder
    tree = {
        "pixel_decoder": {
            "level_embed": pd.level_embed.detach().numpy(),
            "lateral_conv": _conv_tree_nobias(pd.lateral_conv),
            "lateral_gn": _norm_tree(pd.lateral_gn),
            "output_conv": _conv_tree_nobias(pd.output_conv),
            "output_gn": _norm_tree(pd.output_gn),
            "mask_feature": _conv_tree(pd.mask_feature),
        },
        "level_embed": t.level_embed.detach().numpy(),
        "query_feat": t.query_feat.detach().numpy(),
        "decoder_norm": _norm_tree(t.decoder_norm),
        "cls_embed": _dense_tree(t.cls_embed),
        "mask_embed": {"fc0": _dense_tree(t.mask_fc0),
                       "fc1": _dense_tree(t.mask_fc1),
                       "fc2": _dense_tree(t.mask_fc2)},
    }
    for i in range(LEVELS):
        tree["pixel_decoder"][f"input_conv{i}"] = _conv_tree(pd.input_convs[i])
        tree["pixel_decoder"][f"input_gn{i}"] = _norm_tree(pd.input_gns[i])
    for i in range(ENC_LAYERS):
        tree["pixel_decoder"][f"encoder_layer{i}"] = _enc_layer_tree(
            pd.layers[i])
    for i in range(DEC_LAYERS):
        tree[f"decoder_layer{i}"] = _dec_layer_tree(t.layers[i])
    return tree


def _reins_tree(r):
    return {
        "learnable_tokens": r.learnable_tokens.detach().numpy(),
        "scale": r.scale.detach().numpy(),
        "mlp_token2feat": _dense_tree(r.mlp_token2feat),
        "mlp_delta_f": _dense_tree(r.mlp_delta_f),
        "transform": _dense_tree(r.transform),
        "merge": _dense_tree(r.merge),
    }


# --------------------------------------------------------------------------
# the test
# --------------------------------------------------------------------------

def test_rein_mask2former_midscale_e2e():
    from tools.convert_dinov2 import convert_dinov2_state_dict

    from vfmseg_tpu.models.backbones.adapters import ReinsSpec
    from vfmseg_tpu.models.backbones.dinov2 import build_dinov2
    from vfmseg_tpu.models.heads.mask2former import Mask2FormerHead
    from vfmseg_tpu.models.segmentors.maskformer import MaskFormerSegmentor

    dim, depth, heads, img = C, 4, 4, 256
    torch.manual_seed(7)
    tbackbone = TorchReinDino(dim, depth, heads, img).eval()
    thead = TorchM2FHead(dim).eval()

    backbone_tree = convert_dinov2_state_dict(
        _torch_state_dict_as_numpy(tbackbone.vit), target_patch=16,
        target_img=img)
    backbone_tree["reins"] = _reins_tree(tbackbone.reins)

    jmodel = MaskFormerSegmentor(
        backbone=build_dinov2(
            patch_size=16, embed_dim=dim, depth=depth, num_heads=heads,
            img_size=img, out_indices=(0, 1, 2, 3), attn_impl="xla",
            reins=ReinsSpec(token_length=NQ, query_dims=C)),
        decode_head=Mask2FormerHead(
            num_classes=NUM_CLASSES, num_queries=NQ, feat_channels=C,
            num_decoder_layers=DEC_LAYERS, num_heads=HEADS),
        num_classes=NUM_CLASSES)
    variables = {"params": {"backbone": backbone_tree,
                            "decode_head": _head_tree(thead)}}

    x = (np.random.RandomState(7).randn(1, 256, 512, 3) * 0.5).astype(
        np.float32)
    with torch.no_grad():
        feats, queries = tbackbone(
            torch.from_numpy(x).permute(0, 3, 1, 2), out_indices=(0, 1, 2, 3))
        ref_sem = thead(feats, queries).numpy()          # [B, h, w, K]

    our_sem = np.asarray(jmodel.apply(
        variables, jnp.asarray(x), method=MaskFormerSegmentor.forward))

    drift = float(np.max(np.abs(our_sem - ref_sem)))
    agree = float((our_sem.argmax(-1) == ref_sem.argmax(-1)).mean())
    print(f"[m2f midscale e2e] semantic-prob drift {drift:.3e}, "
          f"argmax agreement {agree:.5f}")
    # semantic probabilities live in [0, 1]; fp32 drift through backbone +
    # 6 encoder + 3 decoder layers measured in PARITY.md. argmax must agree
    # everywhere except true ties.
    assert drift < 2e-3, drift
    assert agree >= 0.999, agree
