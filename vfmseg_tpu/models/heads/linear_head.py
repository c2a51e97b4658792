"""LinearHead — the "VFMNet" coarse decode head.

Rebuilds rein/models/heads/linear_head.py:36-70: concat the 4 backbone maps,
1x1 conv + GroupNorm(32) + ReLU fuse down to C, two stride-2 transposed convs
(C -> C/2 -> C/4) with (Sync)BatchNorm + GELU upscaling x4, then dropout +
1x1 classifier. NHWC throughout.

SyncBN note: under a jitted global-batch train step the flax BatchNorm
reduction already spans the whole (sharded) batch — XLA inserts the
cross-device collective — so "SyncBN" is just BatchNorm here (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.common import gn_groups


@MODELS.register("LinearHead")
class LinearHead(nn.Module):
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    channels: int = 256            # classifier width == in_channels[0] // 4
    num_classes: int = 19
    dropout_ratio: float = 0.1
    align_corners: bool = False
    bn_momentum: float = 0.9       # torch BN momentum 0.1 == flax 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jax.Array, ...], train: bool = False) -> jax.Array:
        c = self.in_channels[0]
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="fusion_conv")(x)
        x = nn.GroupNorm(num_groups=gn_groups(c), epsilon=1e-5, dtype=self.dtype,
                         name="fusion_gn")(x)
        x = nn.relu(x)

        x = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="up1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=1e-5, dtype=self.dtype, name="up_bn")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="up2")(x)
        x = nn.gelu(x, approximate=False)

        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(x)
