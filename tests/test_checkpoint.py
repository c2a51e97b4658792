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


def test_resume_restores_optimizer_exactly(tmp_path):
    """train-4 -> save -> fresh state -> restore -> train-4 must equal
    train-8: Adam moments AND the schedule position (step count) survive
    (mmengine resume semantics, reference tools/train.py:104-105)."""
    import optax

    from vfmseg_tpu.train.optim import make_optimizer

    def fresh():
        trainable = {"head": {"w": jnp.full((4, 4), 0.7)}}
        optimizer = make_optimizer(trainable, base_lr=0.1, max_steps=8,
                                   weight_decay=0.01)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), trainable=trainable, frozen={},
            batch_stats={}, opt_state=optimizer.init(trainable))
        return state, optimizer

    target = jnp.ones((4, 4))

    def run(state, optimizer, n):
        losses = []
        for _ in range(n):
            def loss_fn(t):
                return jnp.mean((t["head"]["w"] - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            state = state.replace(step=state.step + 1, trainable=trainable,
                                  opt_state=opt_state)
            losses.append(float(loss))
        return state, losses

    # straight 8-step run
    state_a, optimizer = fresh()
    _, losses_8 = run(state_a, optimizer, 8)

    # 4 steps -> checkpoint -> restore into a FRESH state -> 4 more
    state_b, optimizer = fresh()
    state_b, losses_first4 = run(state_b, optimizer, 4)
    mgr = CheckpointManager(str(tmp_path), max_keep=2)
    mgr.save(state_b)

    state_c, optimizer = fresh()
    state_c = mgr.restore(state_c)
    assert int(state_c.step) == 4
    # Adam count restored -> PolyLR resumes mid-schedule, not at base lr
    counts = [np.asarray(x) for x in jax.tree_util.tree_leaves(state_c.opt_state)
              if np.asarray(x).ndim == 0 and np.asarray(x).dtype == np.int32]
    assert any(int(c) == 4 for c in counts)
    _, losses_resumed = run(state_c, optimizer, 4)

    np.testing.assert_allclose(losses_resumed, losses_8[4:], rtol=1e-6)
    assert losses_first4 == losses_8[:4]


def test_resume_opt_leaf_mismatch_raises(tmp_path):
    import optax

    trainable = {"head": {"w": jnp.ones((2, 2))}}
    tx_a = optax.adam(1e-3)
    state = TrainState(step=jnp.asarray(3, jnp.int32), trainable=trainable,
                       frozen={}, batch_stats={},
                       opt_state=tx_a.init(trainable))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state)

    tx_b = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    other = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       frozen={}, batch_stats={},
                       opt_state=tx_b.init(trainable))
    import pytest

    # same leaf count would silently misassign; different counts must raise
    if len(jax.tree_util.tree_leaves(other.opt_state)) != len(
            jax.tree_util.tree_leaves(state.opt_state)):
        with pytest.raises(ValueError):
            mgr.restore(other)


def test_compose_full_params(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, {"t": {"decode_head": {"w": np.ones((2,))},
                             "backbone": {"lora": np.ones((3,))}}})
    backbone = {"w0": np.zeros((4,))}
    full = compose_full_params(path, backbone)
    assert "decode_head" in full
    assert "lora" in full["backbone"] and "w0" in full["backbone"]


def test_async_save_with_donated_source(tmp_path):
    """Async save must survive the caller's buffers being donated/deleted
    right after save() returns (the train step donates state)."""
    mgr = CheckpointManager(str(tmp_path), max_keep=2, async_save=True)
    state = _state(7, seed=7)
    mgr.save(state)
    # simulate donation: delete the source buffers immediately
    for leaf in jax.tree_util.tree_leaves(state.trainable):
        leaf.delete()
    mgr.wait()
    restored = mgr.restore(_state(0, seed=0))
    assert int(restored.step) == 7
    expect = _state(7, seed=7)
    np.testing.assert_allclose(np.asarray(restored.trainable["head"]["w"]),
                               np.asarray(expect.trainable["head"]["w"]))
