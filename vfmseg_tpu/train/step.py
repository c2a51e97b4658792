"""The jitted train step.

One functional step `(state, batch, rng) -> (state, metrics)` replaces the
reference's Runner.train_step + backward-inside-loss idiosyncrasies
(SURVEY §3.1, DG.py:27-31 normalization note). Total loss = sum of all
entries whose key contains "loss" (mmengine parse_losses semantics).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vfmseg_tpu.train.optim import merge_params
from vfmseg_tpu.train.state import TrainState


def sum_losses(losses: Dict[str, jax.Array]) -> jax.Array:
    return sum(v for k, v in losses.items() if "loss" in k)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    *,
    rng_names: Tuple[str, ...] = ("crop", "mask", "dropout", "augment"),
    donate: bool = True,
) -> Callable:
    """Build a jitted two-scale train step for a segmentor module whose
    __call__(img, labels) returns a loss dict."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {
            name: jax.random.fold_in(step_rng, i)
            for i, name in enumerate(rng_names)
        }

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            variables = {"params": params}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables, batch["img"], batch["label"], rngs=rngs,
                mutable=mutable,
            )
            losses, new_state = out if mutable else (out, {})
            return sum_losses(losses), (losses, new_state)

        (loss, (losses, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(
            step=state.step + 1,
            trainable=trainable,
            opt_state=opt_state,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
        )
        metrics = dict(losses)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
