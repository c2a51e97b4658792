"""VFMHead — the "MGRNet" context-conditioned refinement head.

Rebuilds rein/models/heads/VFMHead.py:28-89: fuse the 4 backbone maps with a
1x1 conv + GroupNorm(32) + GELU; bilinear-resize the coarse context logits to
4x the feature grid and embed them through a stride-2 conv stack back down to
the feature grid; run the (Mask)TransformerDecoder with image features as the
query and the embedded context as cross-attention context; classify.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.common import gn_groups
from vfmseg_tpu.models.heads.transformer import TransformerDecoder
from vfmseg_tpu.ops.resize import resize


@MODELS.register("VFMHead")
class VFMHead(nn.Module):
    transformer: dict = None
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1
    align_corners: bool = False
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jax.Array, ...], context_logits: jax.Array,
                 train: bool = False, mask_enable: bool = True) -> jax.Array:
        gh, gw = feats[0].shape[1], feats[0].shape[2]
        ch = self.channels

        context = resize(
            context_logits, size=(gh * 4, gw * 4), method="bilinear",
            align_corners=self.align_corners,
        )

        x = jnp.concatenate(feats, axis=-1)
        x = nn.Conv(ch, (1, 1), dtype=self.dtype, name="fuse_conv")(x)
        x = nn.GroupNorm(num_groups=gn_groups(ch), epsilon=1e-5, dtype=self.dtype,
                         name="fuse_gn")(x)
        img_feats = nn.gelu(x, approximate=False)

        e = nn.Conv(ch // 4, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="embed_conv1")(context)
        e = nn.GroupNorm(num_groups=gn_groups(ch // 4), epsilon=1e-5, dtype=self.dtype,
                         name="embed_gn1")(e)
        e = nn.gelu(e, approximate=False)
        e = nn.Conv(ch // 2, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="embed_conv2")(e)
        e = nn.GroupNorm(num_groups=gn_groups(ch // 2), epsilon=1e-5, dtype=self.dtype,
                         name="embed_gn2")(e)
        e = nn.gelu(e, approximate=False)
        e = nn.Conv(ch, (1, 1), dtype=self.dtype, name="embed_conv3")(e)
        e = nn.GroupNorm(num_groups=gn_groups(ch), epsilon=1e-5, dtype=self.dtype,
                         name="embed_gn3")(e)

        tcfg = dict(self.transformer or {})
        tcfg.pop("type", None)
        tcfg.setdefault("query_dim", ch)
        tcfg["img_feat_dim"] = ch
        out = TransformerDecoder(
            attn_impl=self.attn_impl, dtype=self.dtype,
            name="transformer_decoder", **tcfg,
        )(img_feats, e, train=train, mask_enable=mask_enable)

        if self.dropout_ratio > 0:
            out = nn.Dropout(rate=self.dropout_ratio)(out, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(out)
