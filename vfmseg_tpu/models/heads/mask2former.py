"""Mask2Former decode head (TPU-native rebuild).

Reimplements the mmseg/mmdet Mask2Former stack the reference configures
(configs/_base_/models/rein_dinov2_mask2former.py:43-161) plus the Rein
modifications (rein/models/heads/rein_mask2former.py): the learned
query_embed is deleted and the Rein-generated per-layer query vector is the
positional query (:16,26-30,79); optional `replace_query_feat` maps queries
to content features through a Linear (:19-21,53-56).

Components:
  * SinePositionalEncoding (static tables, num_feats=128, normalized)
  * MSDeformAttention — XLA gather-based multi-scale deformable attention
    (ops/deform_attn.py) replacing the CUDA op
  * MSDeformAttnPixelDecoder — 6-layer deformable encoder over the 3
    lowest-resolution maps + FPN lateral for the stride-4 mask features
  * Mask2FormerTransformerDecoder — 9 layers of masked cross-attention ->
    self-attention -> FFN (post-norm), cycling the 3 memory levels
  * per-layer class + mask predictions (cls_embed / 3-layer mask MLP)

Everything is NHWC / static shapes; the level loop is unrolled (3 levels).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.ops.attention import xla_attention
from vfmseg_tpu.ops.deform_attn import ms_deform_attn_core
from vfmseg_tpu.ops.resize import resize
from vfmseg_tpu.ops.norm import LayerNorm


@functools.lru_cache(maxsize=64)
def sine_positional_encoding(h: int, w: int, num_feats: int = 128,
                             temperature: float = 10000.0) -> np.ndarray:
    """DETR sine embedding [h*w, 2*num_feats] (mmdet SinePositionalEncoding,
    normalize=True, scale=2*pi, eps=1e-6), all-valid mask."""
    eps, scale = 1e-6, 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float64)[None, :].repeat(h, 0)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = temperature ** (2 * (np.arange(num_feats) // 2) / num_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).reshape(
        h * w, 2 * num_feats).astype(np.float32)


def _deform_offset_init(key, shape, dtype=jnp.float32, num_heads=8,
                        num_points=4):
    """mmcv MSDeformAttn sampling_offsets bias init: per-head unit
    directions on an 8-spoke grid, scaled by (point_index + 1), replicated
    across levels."""
    del key
    lp = shape[0] // (num_heads * 2)  # levels * points
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [heads, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, :], (1, lp, 1))
    point_scale = (np.arange(lp) % num_points) + 1
    grid = grid * point_scale[None, :, None]
    return jnp.asarray(grid.reshape(-1), dtype)


class MSDeformAttention(nn.Module):
    """Multi-scale deformable attention (mmcv semantics)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, value_list: Sequence[jax.Array],
                 ref_x: jax.Array, ref_y: jax.Array) -> jax.Array:
        """query: [B, Nq, C]; value_list: per level [B, H, W, C];
        ref_x / ref_y: [Nq] normalized reference coords (shared across
        levels — mmdet all-valid ratios)."""
        b, nq, c = query.shape
        h_, l_, p_ = self.num_heads, self.num_levels, self.num_points
        d = c // h_

        value_proj = nn.Dense(c, dtype=self.dtype, name="value_proj")
        proj_values = [
            value_proj(v).reshape(v.shape[0], v.shape[1], v.shape[2], h_, d)
            for v in value_list
        ]

        # one clean [b, nq, F] -> [b, F, nq] transpose, then every
        # coordinate/weight tensor keeps nq as the minor dim (see
        # ms_deform_attn_core docstring for the layout rationale)
        offsets = nn.Dense(
            h_ * l_ * p_ * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=functools.partial(_deform_offset_init),
            name="sampling_offsets",
        )(query).transpose(0, 2, 1).reshape(b, h_, l_, p_, 2, nq)
        attn = nn.Dense(
            h_ * l_ * p_, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="attention_weights",
        )(query).transpose(0, 2, 1).reshape(b, h_, l_ * p_, nq)
        attn = jax.nn.softmax(attn, axis=2).reshape(b, h_, l_, p_, nq)

        inv_wh = np.asarray(
            [[1.0 / v.shape[2], 1.0 / v.shape[1]] for v in value_list],
            np.float32)  # [(1/W, 1/H)] per level
        off = offsets.astype(jnp.float32)
        loc_x = (ref_x[None, None, None, None, :]
                 + off[:, :, :, :, 0, :] * inv_wh[None, None, :, 0, None, None])
        loc_y = (ref_y[None, None, None, None, :]
                 + off[:, :, :, :, 1, :] * inv_wh[None, None, :, 1, None, None])
        out = ms_deform_attn_core(proj_values, loc_x, loc_y, attn)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class FFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (fused in_proj + out_proj)."""

    embed_dims: int = 256
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jax.Array] = None):
        c, h_ = self.embed_dims, self.num_heads
        d = c // h_
        # fused projection sliced into q/k/v (torch in_proj layout)
        qkv_kernel = self.param("in_proj_kernel", nn.initializers.lecun_normal(),
                                (c, 3 * c))
        qkv_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        qp = q @ qkv_kernel[:, :c].astype(self.dtype) + qkv_bias[:c].astype(self.dtype)
        kp = k @ qkv_kernel[:, c:2 * c].astype(self.dtype) + qkv_bias[c:2 * c].astype(self.dtype)
        vp = v @ qkv_kernel[:, 2 * c:].astype(self.dtype) + qkv_bias[2 * c:].astype(self.dtype)
        b, nq = qp.shape[0], qp.shape[1]
        nk = kp.shape[1]
        qp = qp.reshape(b, nq, h_, d)
        kp = kp.reshape(b, nk, h_, d)
        vp = vp.reshape(b, nk, h_, d)
        bias = None
        if attn_mask is not None:
            # attn_mask: bool [B, heads, Nq, Nk], True = do not attend
            bias = jnp.where(attn_mask, jnp.float32(-1e9), jnp.float32(0.0))
        out = xla_attention(qp, kp, vp, bias=bias)
        out = out.reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class DeformableEncoderLayer(nn.Module):
    """Post-norm deformable self-attn + FFN (mmdet DeformableDetrTransformer
    EncoderLayer, ffn 1024 ReLU)."""

    embed_dims: int = 256
    num_levels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, value_list_shapes, ref_x, ref_y):
        # value is the current token stream itself, split into level maps
        value_list = _split_levels(x, value_list_shapes)
        attn_out = MSDeformAttention(
            embed_dims=self.embed_dims, num_levels=self.num_levels,
            dtype=self.dtype, name="self_attn",
        )(x + pos, value_list, ref_x, ref_y)
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn_out)
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            FFN(self.embed_dims, 1024, dtype=self.dtype, name="ffn")(x))
        return x


def _split_levels(tokens: jax.Array, shapes: Sequence[Tuple[int, int]]):
    """[B, sum(H*W), ...] -> list of [B, H, W, ...] per level."""
    outs = []
    start = 0
    for (h, w) in shapes:
        outs.append(tokens[:, start:start + h * w].reshape(
            tokens.shape[0], h, w, *tokens.shape[2:]))
        start += h * w
    return outs


class MSDeformAttnPixelDecoder(nn.Module):
    """Pixel decoder: deformable encoder on the 3 lowest-res maps + FPN
    lateral for the stride-4 mask features (mmdet MSDeformAttnPixelDecoder)."""

    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_layers: int = 6
    num_encoder_levels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        """feats: 4 maps high->low res (strides 4, 8, 16, 32), NHWC.
        Returns (mask_features [B, H4, W4, C], memories low->high res)."""
        c = self.feat_channels
        b = feats[0].shape[0]
        # encoder inputs: lowest resolution first (stride 32, 16, 8)
        enc_feats = [feats[3], feats[2], feats[1]]
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (self.num_encoder_levels, c))

        tokens, poses, shapes = [], [], []
        for i, f in enumerate(enc_feats):
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name=f"input_conv{i}")(f)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"input_gn{i}")(x)
            h, w = x.shape[1], x.shape[2]
            shapes.append((h, w))
            tokens.append(x.reshape(b, h * w, c))
            pos = jnp.asarray(sine_positional_encoding(h, w, c // 2))
            poses.append(pos[None] + level_embed[i][None, None])
        x = jnp.concatenate(tokens, axis=1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(p, (b,) + p.shape[1:]) for p in poses], axis=1
        ).astype(self.dtype)

        # reference points: each token's normalized center, same for every
        # level (all-valid ratios); kept as separate x/y vectors (layout)
        ref_list = []
        for (h, w) in shapes:
            ys = (np.arange(h, dtype=np.float32) + 0.5) / h
            xs = (np.arange(w, dtype=np.float32) + 0.5) / w
            grid = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(h * w, 2)
            ref_list.append(grid)
        ref = np.concatenate(ref_list, axis=0)               # [N, 2]
        ref_x = jnp.asarray(ref[:, 0])
        ref_y = jnp.asarray(ref[:, 1])

        for i in range(self.num_encoder_layers):
            x = DeformableEncoderLayer(
                embed_dims=c, num_levels=self.num_encoder_levels,
                dtype=self.dtype, name=f"encoder_layer{i}",
            )(x, pos, shapes, ref_x, ref_y)

        memories = _split_levels(x, shapes)  # [stride32, stride16, stride8]

        # FPN: stride-4 lateral + top-down from the stride-8 memory
        lat = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="lateral_conv")(feats[0])
        lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                           name="lateral_gn")(lat)
        up = resize(memories[-1], size=lat.shape[1:3], method="bilinear",
                    align_corners=False)
        y = lat + up
        y = nn.Conv(c, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                    name="output_conv")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="output_gn")(y)
        y = nn.relu(y)
        mask_features = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                                name="mask_feature")(y)
        return mask_features, memories


class MaskEmbedMLP(nn.Module):
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class Mask2FormerDecoderLayer(nn.Module):
    """cross-attn (masked) -> self-attn -> FFN, post-norm (mmdet
    Mask2FormerTransformerDecoderLayer)."""

    embed_dims: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, cross_attn_mask):
        x = TorchMHA(self.embed_dims, self.num_heads, dtype=self.dtype,
                     name="cross_attn")(
            query + query_pos, key + key_pos, key, attn_mask=cross_attn_mask)
        query = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            query + x)
        x = TorchMHA(self.embed_dims, self.num_heads, dtype=self.dtype,
                     name="self_attn")(
            query + query_pos, query + query_pos, query)
        query = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            query + x)
        query = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(
            FFN(self.embed_dims, self.ffn_dim, dtype=self.dtype,
                name="ffn")(query))
        return query


@MODELS.register("ReinMask2FormerHead")
@MODELS.register("Mask2FormerHead")
class Mask2FormerHead(nn.Module):
    """Mask2Former head; with `rein_queries` the backbone's Rein query vector
    is the positional query (rein_mask2former.py:26-30,79)."""

    num_classes: int = 19
    num_queries: int = 100
    feat_channels: int = 256
    num_transformer_feat_level: int = 3
    num_decoder_layers: int = 9
    num_heads: int = 8
    replace_query_feat: bool = False
    rein_queries: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array],
                 queries: Optional[jax.Array] = None, train: bool = False):
        """feats: 4 NHWC maps (strides 4,8,16,32); queries: [Nq, C] Rein
        query vector (or None -> learned query_embed).

        Returns (cls_preds, mask_preds): lists over decoder stages of
        [B, Nq, num_classes+1] and [B, Nq, H4, W4]."""
        c = self.feat_channels
        b = feats[0].shape[0]

        mask_features, memories = MSDeformAttnPixelDecoder(
            feat_channels=c, out_channels=c, dtype=self.dtype,
            name="pixel_decoder")(feats)

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (self.num_transformer_feat_level, c))
        decoder_inputs, decoder_poses, level_shapes = [], [], []
        for i in range(self.num_transformer_feat_level):
            m = memories[i]
            h, w = m.shape[1], m.shape[2]
            level_shapes.append((h, w))
            decoder_inputs.append(
                m.reshape(b, h * w, c) + level_embed[i][None, None].astype(m.dtype))
            pos = jnp.asarray(sine_positional_encoding(h, w, c // 2))
            decoder_poses.append(
                jnp.broadcast_to(pos[None], (b, h * w, c)).astype(m.dtype))

        if self.rein_queries and queries is not None:
            query_pos = jnp.broadcast_to(queries[None], (b,) + queries.shape)
            query_pos = query_pos.astype(self.dtype)
        else:
            query_pos = jnp.broadcast_to(
                self.param("query_embed", nn.initializers.normal(1.0),
                           (self.num_queries, c))[None],
                (b, self.num_queries, c)).astype(self.dtype)
        if self.replace_query_feat:
            query_feat = nn.Dense(c, dtype=self.dtype, name="querys2feat")(
                query_pos)
        else:
            query_feat = jnp.broadcast_to(
                self.param("query_feat", nn.initializers.normal(1.0),
                           (self.num_queries, c))[None],
                (b, self.num_queries, c)).astype(self.dtype)

        decoder_norm = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                    name="decoder_norm")
        cls_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             name="cls_embed")
        mask_embed = MaskEmbedMLP(c, dtype=self.dtype, name="mask_embed")

        def forward_head(qf, target_hw):
            out = decoder_norm(qf)
            cls_pred = cls_embed(out)
            membed = mask_embed(out)
            mask_pred = jnp.einsum("bqc,bhwc->bqhw", membed, mask_features)
            # attention mask at the next level's resolution
            am = resize(mask_pred.transpose(0, 2, 3, 1), size=target_hw,
                        method="bilinear")
            am = (jax.nn.sigmoid(am.astype(jnp.float32)) < 0.5)
            am = am.transpose(0, 3, 1, 2).reshape(b, self.num_queries, -1)
            # all-masked rows attend everywhere (rein_mask2former.py:71)
            all_true = jnp.all(am, axis=-1, keepdims=True)
            am = jnp.where(all_true, False, am)
            am = jnp.broadcast_to(am[:, None],
                                  (b, self.num_heads) + am.shape[1:])
            return cls_pred, mask_pred, am

        if train:
            cls_preds, mask_preds = [], []
            cls_pred, mask_pred, attn_mask = forward_head(
                query_feat, level_shapes[0])
            cls_preds.append(cls_pred)
            mask_preds.append(mask_pred)

            for i in range(self.num_decoder_layers):
                lvl = i % self.num_transformer_feat_level
                query_feat = Mask2FormerDecoderLayer(
                    embed_dims=c, num_heads=self.num_heads, dtype=self.dtype,
                    name=f"decoder_layer{i}",
                )(query_feat, decoder_inputs[lvl], query_pos,
                  decoder_poses[lvl], attn_mask)
                cls_pred, mask_pred, attn_mask = forward_head(
                    query_feat,
                    level_shapes[(i + 1) % self.num_transformer_feat_level])
                cls_preds.append(cls_pred)
                mask_preds.append(mask_pred)
            return cls_preds, mask_preds

        # Inference: only the final stage's predictions are consumed
        # (semantic_inference reads [-1]; aux stages exist for the training
        # loss only). The intermediate stages exist purely to produce the
        # next layer's attention mask — and bilinear resize commutes with
        # the channel einsum (both linear, disjoint axes), so the mask can
        # be formed at LEVEL resolution against pre-resized mask features:
        #     resize(membed . F)  ==  membed . resize(F)   (real arithmetic)
        # This skips the [B, Nq, H4, W4] per-stage mask + its resize (the
        # mmdet order, rein_mask2former.py:60-71) — 64x fewer mask-einsum
        # FLOPs and no 100-plane full-res intermediates per stage. The fp
        # rounding differs at ~1e-6; only sigmoid(x) ~ 0.5 borderline mask
        # pixels can flip, which the attention mask is insensitive to.
        mask_feats_lvl = [
            resize(mask_features, size=s, method="bilinear",
                   align_corners=False)
            for s in level_shapes
        ]

        def attn_mask_at(qf, lvl):
            membed = mask_embed(decoder_norm(qf))
            am = jnp.einsum("bqc,bhwc->bqhw", membed, mask_feats_lvl[lvl])
            am = (jax.nn.sigmoid(am.astype(jnp.float32)) < 0.5)
            am = am.reshape(b, self.num_queries, -1)
            all_true = jnp.all(am, axis=-1, keepdims=True)
            am = jnp.where(all_true, False, am)
            return jnp.broadcast_to(am[:, None],
                                    (b, self.num_heads) + am.shape[1:])

        attn_mask = attn_mask_at(query_feat, 0)
        for i in range(self.num_decoder_layers):
            lvl = i % self.num_transformer_feat_level
            query_feat = Mask2FormerDecoderLayer(
                embed_dims=c, num_heads=self.num_heads, dtype=self.dtype,
                name=f"decoder_layer{i}",
            )(query_feat, decoder_inputs[lvl], query_pos, decoder_poses[lvl],
              attn_mask)
            if i + 1 < self.num_decoder_layers:
                attn_mask = attn_mask_at(
                    query_feat,
                    (i + 1) % self.num_transformer_feat_level)
        out = decoder_norm(query_feat)
        membed = mask_embed(out)
        mask_pred = jnp.einsum("bqc,bhwc->bqhw", membed, mask_features)
        return [cls_embed(out)], [mask_pred]


def semantic_inference(cls_pred: jax.Array, mask_pred: jax.Array,
                       num_classes: int) -> jax.Array:
    """Final-stage predictions -> semantic logits [B, H, W, num_classes]
    (mmseg Mask2Former postprocessing: softmax cls x sigmoid mask)."""
    probs = jax.nn.softmax(cls_pred.astype(jnp.float32), axis=-1)[..., :num_classes]
    masks = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
    return jnp.einsum("bqc,bqhw->bhwc", probs, masks)
