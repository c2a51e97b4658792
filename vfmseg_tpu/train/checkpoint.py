"""Checkpointing: periodic save / resume / adapter-only checkpoints.

Reference behavior to match (SURVEY §5.4): CheckpointHook every 4k iters
keep 3; Rein/LoRA runs checkpoint only adapters+head (reins_dinov2.py:42-49);
at load time the frozen converted backbone is re-injected
(load_backbone_hook.py:11-22, generate_full_weights.py:36-44). Our TrainState
already splits {trainable, frozen}: a "light" checkpoint stores the trainable
partition (adapters + heads) + opt state; `compose_full_params` re-merges the
converted backbone for inference.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from vfmseg_tpu.train.optim import merge_params
from vfmseg_tpu.train.state import TrainState


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays as an .npz with '/'-joined path keys."""
    flat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(tree).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_pytree(path: str):
    data = np.load(path, allow_pickle=False)
    return unflatten_dict({tuple(k.split("/")): data[k] for k in data.files})


class CheckpointManager:
    """Iteration-numbered checkpoints with max_keep pruning + resume.

    With async_save=True, save() snapshots the (immutable) device arrays and
    a background thread performs the device->host readback + npz write, so
    the train loop never stalls on checkpoint IO — on hosts that reach the
    accelerator over a slow link the readback can take longer than dozens
    of train steps."""

    def __init__(self, work_dir: str, max_keep: int = 3,
                 async_save: bool = False):
        self.dir = os.path.join(work_dir, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.max_keep = max_keep
        self.async_save = async_save
        self._pending = None

    def _path(self, step: int, part: str) -> str:
        return os.path.join(self.dir, f"iter_{step:07d}.{part}.npz")

    def wait(self) -> None:
        """Block until an in-flight async save finishes."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None

    def save(self, state: TrainState, *, light: bool = True) -> None:
        if not self.async_save:
            self._save_sync(state, light=light)
            return
        import threading

        self.wait()  # at most one save in flight
        # device-side copy BEFORE returning: the train step donates the
        # state buffers, so the live arrays would be deleted under the
        # worker thread's feet on the next step
        snapshot = jax.tree_util.tree_map(jax.numpy.copy, state)
        self._pending = threading.Thread(
            target=self._save_sync, args=(snapshot,), kwargs={"light": light},
            daemon=True)
        self._pending.start()

    def _save_sync(self, state: TrainState, *, light: bool = True) -> None:
        step = int(state.step)
        save_pytree(self._path(step, "trainable"), {"t": state.trainable})
        if state.batch_stats:
            save_pytree(self._path(step, "batch_stats"), {"b": state.batch_stats})
        if state.ema is not None:
            save_pytree(self._path(step, "ema"), {"e": state.ema})
        if state.opt_state is not None:
            # optax states are namedtuple pytrees, not dicts — serialize the
            # leaves positionally; restore unflattens into a freshly
            # initialized state's treedef. Matches mmengine checkpoints
            # carrying optimizer+scheduler state (reference tools/train.py
            # --resume, :104-105): Adam moments and the PolyLR position
            # survive a resume.
            leaves = jax.tree_util.tree_leaves(state.opt_state)
            if leaves:
                np.savez(self._path(step, "opt"),
                         **{f"leaf_{i:05d}": np.asarray(x)
                            for i, x in enumerate(leaves)})
        if not light:
            save_pytree(self._path(step, "frozen"), {"f": state.frozen})
        self._prune()

    def latest_step(self) -> Optional[int]:
        self.wait()
        steps = set()
        for f in os.listdir(self.dir):
            m = re.match(r"iter_(\d+)\.trainable\.npz", f)
            if m:
                steps.add(int(m.group(1)))
        return max(steps) if steps else None

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        self.wait()
        step = step if step is not None else self.latest_step()
        if step is None:
            return state
        trainable = load_pytree(self._path(step, "trainable"))["t"]
        bs_path = self._path(step, "batch_stats")
        batch_stats = (
            load_pytree(bs_path)["b"] if os.path.exists(bs_path)
            else state.batch_stats)
        frozen = state.frozen
        fpath = self._path(step, "frozen")
        if os.path.exists(fpath):
            frozen = load_pytree(fpath)["f"]
        ema = state.ema
        epath = self._path(step, "ema")
        if os.path.exists(epath):
            ema = load_pytree(epath)["e"]
        opt_state = state.opt_state
        opath = self._path(step, "opt")
        if opt_state is not None and os.path.exists(opath):
            data = np.load(opath, allow_pickle=False)
            names = sorted(data.files)
            ref = jax.tree_util.tree_leaves(opt_state)
            if len(names) != len(ref):
                raise ValueError(
                    f"optimizer state in {opath} has {len(names)} leaves, "
                    f"current optimizer expects {len(ref)} — did the "
                    f"optimizer config change between save and resume?")
            leaves = [
                np.asarray(data[n], dtype=r.dtype).reshape(np.shape(r))
                for n, r in zip(names, ref)
            ]
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state), leaves)
        return state.replace(
            step=jax.numpy.asarray(step, jax.numpy.int32),
            trainable=trainable, frozen=frozen, batch_stats=batch_stats,
            ema=ema, opt_state=opt_state)

    def _prune(self) -> None:
        steps = sorted({
            int(m.group(1))
            for f in os.listdir(self.dir)
            if (m := re.match(r"iter_(\d+)\.", f))
        })
        for s in steps[:-self.max_keep] if self.max_keep else []:
            for f in os.listdir(self.dir):
                if f.startswith(f"iter_{s:07d}."):
                    os.remove(os.path.join(self.dir, f))


def compose_full_params(adapter_ckpt_path: str, backbone_params,
                        prefix=("backbone",)) -> Any:
    """LoadBackboneHook equivalent: merge an adapter-only checkpoint with a
    converted backbone param tree into full inference params. `prefix` is the
    backbone subtree path — ("model", "backbone") under DomainGeneral
    (see train/optim.resolve_backbone_prefix)."""
    from vfmseg_tpu.train.optim import nest_under

    trainable = load_pytree(adapter_ckpt_path)["t"]
    return merge_params(trainable, nest_under(prefix, backbone_params))
