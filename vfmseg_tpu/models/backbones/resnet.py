"""ResNetV1c backbone + the ReinsResNetV1c adapter variant.

Rebuilds the mmseg ResNetV1c the reference wraps (rein/models/backbones/
reins_resnet.py — configs only under configs/_base_/models/unused/, kept
for capability parity): deep 3-conv stem, 4 bottleneck stages, BN+ReLU.
The Rein variant runs one Reins bank per stage, adapting the flattened
feature map after EVERY sub-layer (reins_resnet.py:33-50), and returns
(4 feature maps, sum of per-stage query vectors).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.core.registry import MODELS
from vfmseg_tpu.models.backbones.adapters import Reins, ReinsSpec
from vfmseg_tpu.models.backbones.rein_backbones import reins_spec_from_config


class Bottleneck(nn.Module):
    channels: int          # bottleneck width; out = channels * 4
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.channels * 4
        residual = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn3")(y)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


@MODELS.register("ResNetV1c")
class ResNetV1c(nn.Module):
    depth_blocks: Sequence[int] = (3, 4, 6, 3)   # resnet-50
    stem_channels: int = 64
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # None => plain ResNet; list of per-stage reins_config overrides =>
    # ReinsResNetV1c behavior
    reins_specs: Optional[Tuple[ReinsSpec, ...]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        # V1c deep stem: three 3x3 convs
        for i, (ch, s) in enumerate([(self.stem_channels // 2, 2),
                                     (self.stem_channels // 2, 1),
                                     (self.stem_channels, 1)]):
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding="SAME",
                        use_bias=False, dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"stem_bn{i}")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        outs: List[jax.Array] = []
        queries = []
        widths = [64, 128, 256, 512]
        for stage, num_blocks in enumerate(self.depth_blocks):
            rein_mod = None
            if self.reins_specs is not None:
                rein_mod = Reins(
                    spec=self.reins_specs[stage], num_layers=num_blocks,
                    embed_dims=widths[stage] * 4, patch_size=16,
                    dtype=self.dtype, name=f"reins_{stage}")
            for blk in range(num_blocks):
                strides = 2 if (blk == 0 and stage > 0) else 1
                x = Bottleneck(widths[stage], strides, self.dtype,
                               name=f"layer{stage + 1}_block{blk}")(x, train)
                if rein_mod is not None:
                    b, h, w, c = x.shape
                    tokens = rein_mod.adapt(
                        x.reshape(b, h * w, c), blk, num_prefix_tokens=0)
                    x = tokens.reshape(b, h, w, c)
            if stage in self.out_indices:
                outs.append(x)
                if rein_mod is not None and self.reins_specs[stage].link_token_to_query:
                    queries.append(rein_mod.queries())
        feats = tuple(outs)
        if queries:
            return feats, sum(queries)
        return feats


@MODELS.register("ReinsResNetV1c")
def build_reins_resnet(reins_config: Dict[str, Any],
                       distinct_cfgs: Optional[Sequence[Dict]] = None,
                       depth: int = 50, out_indices=(0, 1, 2, 3),
                       init_cfg=None, dtype: Any = jnp.float32,
                       **_unused) -> ResNetV1c:
    del init_cfg
    depth_blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    per_stage = distinct_cfgs or [{}] * 4
    specs = tuple(
        reins_spec_from_config({**dict(reins_config or {}), **dict(c)})
        for c in per_stage
    )
    return ResNetV1c(depth_blocks=depth_blocks, out_indices=tuple(out_indices),
                     reins_specs=specs, dtype=dtype)
