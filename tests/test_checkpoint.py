"""Checkpoint save/restore/prune + full-weights composition tests
(SURVEY §4e / §5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.train.checkpoint import (
    CheckpointManager,
    compose_full_params,
    load_pytree,
    save_pytree,
)
from vfmseg_tpu.train.state import TrainState

K = jax.random.PRNGKey


def _state(step, seed=0):
    k = K(seed)
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        trainable={"head": {"w": jax.random.normal(k, (3, 3))}},
        frozen={"backbone": {"w": jnp.ones((2, 2))}},
        batch_stats={"bn": {"mean": jnp.zeros((4,))}},
        opt_state=None,
        ema={"head": {"w": jnp.full((3, 3), 0.5)}},
    )


def test_pytree_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6).reshape(2, 3)}, "c": np.ones(4)}
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    back = load_pytree(path)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])


def test_manager_save_restore_prune(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_keep=2)
    for step in (5, 10, 15):
        mgr.save(_state(step, seed=step))
    assert mgr.latest_step() == 15
    # pruned to 2 newest
    files = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert not any("0000005" in f for f in files)

    restored = mgr.restore(_state(0, seed=99))
    assert int(restored.step) == 15
    expect = _state(15, seed=15)
    np.testing.assert_allclose(np.asarray(restored.trainable["head"]["w"]),
                               np.asarray(expect.trainable["head"]["w"]))
    np.testing.assert_allclose(np.asarray(restored.ema["head"]["w"]), 0.5)
    # frozen not saved in light mode -> kept from the template state
    np.testing.assert_allclose(
        np.asarray(restored.frozen["backbone"]["w"]), 1.0)


def test_compose_full_params(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, {"t": {"decode_head": {"w": np.ones((2,))},
                             "backbone": {"lora": np.ones((3,))}}})
    backbone = {"w0": np.zeros((4,))}
    full = compose_full_params(path, backbone)
    assert "decode_head" in full
    assert "lora" in full["backbone"] and "w0" in full["backbone"]
