"""DINOhead — SegformerHead with cross-attention refinement on a coarse
seg-logits context (rein/models/heads/DINOhead.py:28-120; near-dead in the
reference — kept for capability parity with MultiScaleEncoderDecoder)."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.common import gn_groups
from vfmseg_tpu.models.heads.transformer import TransformerDecoder
from vfmseg_tpu.ops.resize import resize


@MODELS.register("DINOhead")
class DINOHead(nn.Module):
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    channels: int = 256
    num_classes: int = 19
    n_heads: int = 8
    d_head: int = 32
    depth: int = 1
    dropout_ratio: float = 0.1
    align_corners: bool = False
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jax.Array, ...],
                 context_logits: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        target_hw = feats[0].shape[1:3]
        outs = []
        for i, f in enumerate(feats):
            x = nn.Dense(self.channels, dtype=self.dtype, name=f"embed{i}")(f)
            if x.shape[1:3] != target_hw:
                x = resize(x, size=target_hw, method="bilinear",
                           align_corners=self.align_corners)
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fusion_conv")(x)
        x = nn.GroupNorm(num_groups=gn_groups(self.channels), epsilon=1e-5,
                         dtype=self.dtype, name="fusion_gn")(x)
        x = nn.relu(x)
        if context_logits is not None:
            ctx = resize(context_logits, size=target_hw, method="bilinear",
                         align_corners=self.align_corners)
            ctx = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                          name="context_proj")(ctx)
            x = x + TransformerDecoder(
                query_dim=self.channels, img_feat_dim=self.channels,
                n_heads=self.n_heads, d_head=self.d_head, depth=self.depth,
                attn_impl=self.attn_impl, dtype=self.dtype,
                name="refine")(x, ctx, train=train, mask_enable=False)
        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(x)
