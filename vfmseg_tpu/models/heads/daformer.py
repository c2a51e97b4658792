"""DAFormerHead — context-aware multi-level fusion with ASPP.

Rebuilds rein/models/heads/daformer_head.py: per-level embed layers (MLP for
all levels), bilinear-align to the finest level, then an ASPP fusion block
(dilations (1, 6, 12, 18), 256 channels) over the concatenated embeddings
(daformer_head.py:120-180, aspp_head.py)."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.common import gn_groups
from vfmseg_tpu.ops.resize import resize


class ASPPModule(nn.Module):
    """Parallel atrous convs + global pooling branch (aspp_head.py)."""

    channels: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    pool_branch: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        if self.pool_branch:
            g = jnp.mean(x, axis=(1, 2), keepdims=True)
            g = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name="pool_conv")(g)
            g = nn.relu(g)
            outs.append(jnp.broadcast_to(g, x.shape[:3] + (self.channels,)))
        for i, d in enumerate(self.dilations):
            k = (1, 1) if d == 1 else (3, 3)
            y = nn.Conv(self.channels, k, kernel_dilation=(d, d),
                        padding="SAME", dtype=self.dtype, name=f"branch{i}")(x)
            y = nn.GroupNorm(num_groups=gn_groups(self.channels), epsilon=1e-5,
                             dtype=self.dtype, name=f"branch{i}_gn")(y)
            outs.append(nn.relu(y))
        return jnp.concatenate(outs, axis=-1)


@MODELS.register("DAFormerHead")
class DAFormerHead(nn.Module):
    """fusion="aspp" is the context-aware DAFormer (sepaspp base,
    daformer_sepaspp_mitb5.py); fusion="conv1" is the plain 1x1-conv fusion
    (daformer_conv1_mitb5.py — "SegF. with C_e=256")."""

    in_channels: Sequence[int] = (64, 128, 320, 512)
    channels: int = 256
    num_classes: int = 19
    dilations: Sequence[int] = (1, 6, 12, 18)
    fusion: str = "aspp"
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
        if self.fusion == "aspp":
            x = ASPPModule(self.channels, tuple(self.dilations),
                           dtype=self.dtype, name="fuse_aspp")(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fuse_proj")(x)
        x = nn.GroupNorm(num_groups=gn_groups(self.channels), epsilon=1e-5,
                         dtype=self.dtype, name="fuse_gn")(x)
        x = nn.relu(x)
        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(x)
