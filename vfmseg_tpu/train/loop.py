"""Training loop: iteration-based, with periodic val + checkpointing.

Replaces mmengine IterBasedTrainLoop + hooks (SURVEY §1 L2): logging every
`log_interval`, checkpoint every `checkpoint_interval` (keep max_keep),
validation every `val_interval`, resume from latest checkpoint.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.train.checkpoint import CheckpointManager
from vfmseg_tpu.train.state import TrainState


class MetricLogger:
    """JSONL + console logger (the TensorboardVisBackend analogue that needs
    no external deps; files are greppable/plottable)."""

    def __init__(self, work_dir: str, log=print):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "metrics.jsonl")
        self.log = log

    def write(self, step: int, metrics: Dict, prefix: str = "train"):
        rec = {"step": step, "prefix": prefix}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        pretty = " ".join(f"{k}={rec[k]:.4g}" if isinstance(rec[k], float)
                          else f"{k}={rec[k]}" for k in sorted(rec)
                          if k not in ("step", "prefix"))
        self.log(f"[{prefix}] iter {step}: {pretty}")


def train_loop(
    state: TrainState,
    step_fn: Callable,
    data_iter: Iterable,
    *,
    max_iters: int,
    work_dir: str,
    rng: jax.Array,
    log_interval: int = 50,
    checkpoint_interval: int = 4000,
    max_keep_ckpts: int = 3,
    val_interval: int = 0,
    val_fn: Optional[Callable] = None,
    debug_interval: int = 0,
    debug_fn: Optional[Callable] = None,
    save_best: Optional[str] = None,
    resume: bool = False,
    batch_sharding=None,
) -> TrainState:
    """batch_sharding: optional NamedSharding placing each batch over the
    data mesh axis (multi-chip data parallelism; gradients all-reduce
    automatically under jit — the NCCL-DDP replacement, SURVEY §2.10)."""
    ckpt = CheckpointManager(work_dir, max_keep=max_keep_ckpts,
                             async_save=True)
    logger = MetricLogger(work_dir)
    best_metric = float("-inf")
    if resume:
        state = ckpt.restore(state)

    start = int(state.step)
    t0 = time.time()
    window = max(log_interval, 1)
    for it in range(start, max_iters):
        batch = next(data_iter)
        if batch_sharding is not None:
            # one transfer, straight to the sharded layout (jnp.asarray
            # first would land on device 0 and then reshard)
            batch = jax.device_put(dict(batch), batch_sharding)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch, rng)
        if (it + 1) % window == 0:
            steps_per_s = window / max(time.time() - t0, 1e-9)
            t0 = time.time()
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            metrics["steps_per_sec"] = steps_per_s
            logger.write(it + 1, metrics)
        if checkpoint_interval and (it + 1) % checkpoint_interval == 0:
            ckpt.save(state)
        if val_interval and val_fn is not None and (it + 1) % val_interval == 0:
            results = val_fn(state)
            logger.write(it + 1, results, prefix="val")
            if save_best and results.get(save_best, float("-inf")) > best_metric:
                # reference CheckpointHook save_best='citys_mIoU' behavior
                best_metric = results[save_best]
                from vfmseg_tpu.train.checkpoint import save_pytree

                save_pytree(os.path.join(work_dir, "checkpoints",
                                         "best.trainable.npz"),
                            {"t": state.trainable})
                logger.log(f"[val] new best {save_best}={best_metric:.2f} "
                           f"-> checkpoints/best.trainable.npz")
        if debug_interval and debug_fn is not None and (it + 1) % debug_interval == 0:
            # reference log_config.img_interval debug dumps (SURVEY §5.5)
            debug_fn(state, batch, it + 1)
    ckpt.wait()   # flush any in-flight async checkpoint before returning
    return state
