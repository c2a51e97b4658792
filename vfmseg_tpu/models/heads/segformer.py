"""SegformerHead — the mmseg all-MLP decode head used by the reference's
rein/frozen *_segformer configs (SURVEY §2.11): per-level Linear embed,
bilinear-resize to the highest resolution, concat, 1x1 ConvModule fuse,
dropout + classifier."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.common import gn_groups
from vfmseg_tpu.ops.resize import resize


@MODELS.register("SegformerHead")
class SegformerHead(nn.Module):
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jax.Array, ...], train: bool = False) -> jax.Array:
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
        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(x)
