"""Functional train state: (trainable, frozen, batch_stats, opt_state, step)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    trainable: Any          # param subtree being optimized
    frozen: Any             # frozen param subtree (e.g. VFM backbone weights)
    batch_stats: Any        # flax BatchNorm running stats ({} if none)
    opt_state: Any
    ema: Any = None         # optional EMA params (DACS teacher head)
