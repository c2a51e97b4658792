"""AttentionHead — HRDA's scale-attention net.

Rebuilds rein/models/heads/attention_head.py: concat the 4 backbone maps,
1x1 ConvModule (GN32 + ReLU) fuse, dropout + 1x1 classifier whose sigmoid
becomes the per-pixel high-res attention (hrda.py:149-210; config
configs/_base_/models/lora_dinov2_hrda.py:53-63).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.common import gn_groups


@MODELS.register("AttentionHead")
class AttentionHead(nn.Module):
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jax.Array, ...], train: bool = False) -> jax.Array:
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name="fusion_conv")(x)
        x = nn.GroupNorm(num_groups=gn_groups(self.channels), epsilon=1e-5,
                         dtype=self.dtype, name="fusion_gn")(x)
        x = nn.relu(x)
        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(x)
