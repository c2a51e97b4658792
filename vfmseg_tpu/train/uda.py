"""DACS self-training UDA step.

Rebuilds rein/models/uda/dacs.py as one functional jitted step
(SURVEY §3.4), normalizing away per-branch backward calls:

  * EMA teacher = EMA copy of the decode head only (dacs.py:87,103-143);
    features come from the shared backbone; the EMA tree rides
    TrainState.ema and lerps with alpha = min(1 - 1/(iter+1), 0.999)
  * teacher pseudo-labels on the target batch with a scalar
    confidence-ratio weight (prob >= 0.968), top 15 / bottom 120 pixel rows
    zeroed (:253-279)
  * ClassMix: ~half the source classes pasted onto the target image,
    labels and weights mixed alike; strong transform (jitter/blur) on the
    mixed image (:285-299)
  * one optimizer step over source CE + mixed pixel-weighted CE
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from vfmseg_tpu.models.algorithms.augment import (
    class_mix_masks,
    one_mix,
    strong_transform,
)
from vfmseg_tpu.train.optim import merge_params
from vfmseg_tpu.train.state import TrainState
from vfmseg_tpu.train.step import sum_losses
from vfmseg_tpu.utils.misc import add_prefix

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class DACSConfig:
    pseudo_threshold: float = 0.968
    psweight_ignore_top: int = 15
    psweight_ignore_bottom: int = 120
    color_jitter_strength: float = 0.25
    color_jitter_probability: float = 0.2
    blur: bool = True
    num_classes: int = 19
    alpha: float = 0.999  # EMA decay cap
    head_key: str = "decode_head"


def _replace_subtree(params, key: str, subtree):
    out = dict(params)
    out[key] = subtree
    return out


def dacs_mix(model, cfg: DACSConfig, state: TrainState,
             batch: Dict[str, jax.Array], step_rng, mean, std):
    """The DACS pre-loss block (dacs.py:232-295): EMA-teacher pseudo-labels
    on the target, ClassMix, pseudo-weight map, strong transform. Shared by
    the train step and the debug dumps."""
    k_mix, k_aug, _ = jax.random.split(step_rng, 3)
    src_img, src_lbl = batch["img"], batch["label"]
    tgt_img = batch["target_img"]
    b, h, w = src_lbl.shape

    params = merge_params(state.trainable, state.frozen)
    teacher_params = _replace_subtree(params, cfg.head_key, state.ema)
    tvars = {"params": teacher_params}
    if state.batch_stats:
        tvars["batch_stats"] = state.batch_stats
    tgt_logits = model.apply(tvars, tgt_img,
                             method=type(model).encode_decode)
    probs = jax.nn.softmax(tgt_logits.astype(jnp.float32), axis=-1)
    max_prob = jnp.max(probs, axis=-1)
    pseudo_label = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    pweight = jnp.mean((max_prob >= cfg.pseudo_threshold).astype(jnp.float32))
    weight_map = jnp.full((b, h, w), pweight, jnp.float32)
    if cfg.psweight_ignore_top > 0:
        weight_map = weight_map.at[:, :cfg.psweight_ignore_top].set(0.0)
    if cfg.psweight_ignore_bottom > 0:
        weight_map = weight_map.at[:, -cfg.psweight_ignore_bottom:].set(0.0)

    mix_mask = class_mix_masks(k_mix, src_lbl, cfg.num_classes)
    mixed_img = one_mix(mix_mask, src_img.astype(jnp.float32),
                        tgt_img.astype(jnp.float32))
    mixed_lbl = jnp.where(mix_mask > 0.5, src_lbl, pseudo_label)
    mixed_weight = one_mix(mix_mask, jnp.ones_like(weight_map), weight_map)
    mixed_img = strong_transform(
        k_aug, mixed_img, mean, std, cfg.color_jitter_strength,
        cfg.color_jitter_probability, 1.0 if cfg.blur else 0.0
    ).astype(src_img.dtype)
    # normalized prediction entropy of the teacher on the target
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-12), axis=-1) / jnp.log(
        jnp.float32(probs.shape[-1]))
    return {
        "mixed_img": mixed_img, "mixed_lbl": mixed_lbl,
        "mixed_weight": mixed_weight, "pseudo_weight": pweight,
        "pseudo_label": pseudo_label, "mix_mask": mix_mask,
        "entropy": entropy,
    }


def make_dacs_debug_fn(model, cfg: DACSConfig = DACSConfig()) -> Callable:
    """Jitted (state, batch, rng) -> DACS debug tensors for the periodic
    class_mix_debug grids (reference dacs.py:310-362: pseudo-label, mix
    mask, mixed sample, teacher entropy)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    @jax.jit
    def debug_tensors(state: TrainState, batch: Dict[str, jax.Array], rng):
        step_rng = jax.random.fold_in(rng, state.step)
        return dacs_mix(model, cfg, state, batch, step_rng, mean, std)

    return debug_tensors


def make_dacs_train_step(model, optimizer: optax.GradientTransformation,
                         cfg: DACSConfig = DACSConfig(),
                         donate: bool = True) -> Callable:
    """model: an EncoderDecoder-style segmentor (CE losses, pixel_weight
    support). batch: {img, label, target_img}.

    For plain EncoderDecoder models the source and mixed student passes
    batch into ONE 2B backbone call: the reference dispatches them as
    separate per-branch forward+backward calls (dacs.py:250,306) only
    because torch autograd runs eagerly — the two passes share params and
    have no data dependency (the mixed image depends on the TEACHER, which
    runs before the student step). Doubling the student batch doubles the
    arithmetic intensity of every frozen-ViT matmul (the dominant FLOPs).
    Per-sample math is identical to two sequential calls; what changes is
    dropout draws (different RNG offsets) and BatchNorm batch statistics
    (one joint 2B moment instead of two sequential B moments — the same
    semantics DDP SyncBN would give the reference on 2 GPUs)."""

    from vfmseg_tpu.models.losses import cross_entropy_loss, seg_accuracy
    from vfmseg_tpu.models.segmentors.encoder_decoder import EncoderDecoder
    from vfmseg_tpu.ops.resize import resize

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    # exact-type check: a subclass may override __call__'s loss structure,
    # in which case the concat-and-split CE below would not reproduce it
    batch_students = type(model) is EncoderDecoder

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        step_rng = jax.random.fold_in(rng, state.step)
        k_drop = jax.random.split(step_rng, 3)[2]
        src_img, src_lbl = batch["img"], batch["label"]
        mix = dacs_mix(model, cfg, state, batch, step_rng, mean, std)
        mixed_img, mixed_lbl = mix["mixed_img"], mix["mixed_lbl"]
        mixed_weight, pweight = mix["mixed_weight"], mix["pseudo_weight"]

        rngs = {"dropout": k_drop, "mask": jax.random.fold_in(k_drop, 1),
                "crop": jax.random.fold_in(k_drop, 2)}

        def loss_fn_batched(trainable):
            p = merge_params(trainable, state.frozen)
            variables = {"params": p}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            b = src_img.shape[0]
            img2b = jnp.concatenate(
                [src_img, mixed_img.astype(src_img.dtype)], axis=0)
            out = model.apply(variables, img2b, True, rngs=rngs,
                              mutable=mutable,
                              method=EncoderDecoder.forward)
            logits2b, new_state = out if mutable else (out, {})
            logits2b = resize(logits2b, size=src_lbl.shape[1:3],
                              method="bilinear",
                              align_corners=model.align_corners)
            src_logits, mix_logits = logits2b[:b], logits2b[b:]
            losses = {
                "src.decode.loss_ce": cross_entropy_loss(src_logits, src_lbl),
                "src.decode.acc_seg": seg_accuracy(src_logits, src_lbl),
                "mix.decode.loss_ce": cross_entropy_loss(
                    mix_logits, mixed_lbl, pixel_weight=mixed_weight),
                "mix.decode.acc_seg": seg_accuracy(mix_logits, mixed_lbl),
            }
            return sum_losses(losses), (losses, new_state)

        def loss_fn_sequential(trainable):
            p = merge_params(trainable, state.frozen)
            variables = {"params": p}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(variables, src_img, src_lbl, rngs=rngs,
                              mutable=mutable)
            src_losses, new_state = out if mutable else (out, {})
            variables2 = {"params": p}
            if state.batch_stats:
                variables2["batch_stats"] = new_state.get(
                    "batch_stats", state.batch_stats)
            out2 = model.apply(variables2, mixed_img, mixed_lbl, True,
                               mixed_weight, rngs=rngs, mutable=mutable)
            mix_losses, new_state2 = out2 if mutable else (out2, {})
            losses = dict(add_prefix(src_losses, "src"))
            losses.update(add_prefix(mix_losses, "mix"))
            return sum_losses(losses), (losses, new_state2)

        loss_fn = loss_fn_batched if batch_students else loss_fn_sequential

        (loss, (losses, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)

        # EMA head update (dacs.py:131-143)
        alpha = jnp.minimum(1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0),
                            cfg.alpha)
        new_head = merge_params(trainable, state.frozen)[cfg.head_key]
        ema = jax.tree_util.tree_map(
            lambda e, p: alpha * e + (1.0 - alpha) * p, state.ema, new_head)

        new_state = state.replace(
            step=state.step + 1, trainable=trainable, opt_state=opt_state,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            ema=ema)
        metrics = dict(losses)
        metrics["loss"] = loss
        metrics["pseudo_weight"] = pweight
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
