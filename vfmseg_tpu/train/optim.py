"""Optimizer construction and PEFT parameter partitioning.

Replaces the reference's PEFTOptimWrapperConstructor + requires_grad surgery
(rein/optimizers/peft_optimizer_constructor.py:52-80,150;
rein/models/backbones/utils.py:9-41) with the functional idiom (SURVEY §7.1):

  * the parameter tree is *partitioned* into trainable/frozen by path
    predicates; gradients are only taken w.r.t. the trainable partition
    (XLA dead-code-eliminates the frozen dW matmuls)
  * AdamW lr=1e-4 wd=0.05 betas (0.9, 0.999) eps 1e-8 with PolyLR power 0.9
    (configs/dg/gta2citys/dg_lora_dinov2_ms_masked.py:11-29)
  * weight decay is masked off for norm/embedding-style params, mirroring
    the reference custom_keys (norm / learnable_tokens / reins.scale /
    query_embed / level_embed with decay_mult=0)
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

# Params whose flattened path contains any of these substrings get no weight
# decay. Covers LayerNorm/GroupNorm/BatchNorm scales+biases (ours are named
# norm*/…_gn/…_bn), adapters' token banks and scales, and positional/query
# embeddings.
NO_DECAY_KEYWORDS: Tuple[str, ...] = (
    "norm", "_gn", "_bn", "bn/", "learnable_tokens", "reins/scale",
    "query_embed", "level_embed", "pos_embed", "cls_token", "mask_token",
)

# Reference freezing policies (SURVEY §3.1, §3.3): inside the backbone only
# adapter params train; heads always train fully. "fpn" covers ReinsCLIP,
# whose pyramid trains alongside the adapters (reins_clip.py:87-90); no other
# backbone has fpn-named params, so it is harmless elsewhere.
ADAPTER_KEYWORDS: Tuple[str, ...] = ("lora", "reins", "fpn")


def _flat(params) -> Dict[str, jax.Array]:
    return {"/".join(k): v for k, v in flatten_dict(params).items()}


def _unflat(flat: Dict[str, jax.Array]):
    return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


def trainable_predicate(
    peft: bool = True,
    adapter_keywords: Iterable[str] = ADAPTER_KEYWORDS,
    backbone_prefix: str = "backbone",
    extra_trainable: Iterable[str] = (),
) -> Callable[[str], bool]:
    """Path -> bool. With peft=True, backbone params train only if they are
    adapter params (lora_a/lora_b/reins.*); everything else (heads) trains."""

    def pred(path: str) -> bool:
        if not peft:
            return True
        # match the backbone scope at any depth: wrappers such as
        # DomainGeneral nest the segmentor under "model/", so paths look like
        # "model/backbone/..." (reference Wrapper.py delegates; freezing must
        # still apply to the inner backbone).
        if backbone_prefix in path.split("/"):
            return any(k in path for k in adapter_keywords) or any(
                k in path for k in extra_trainable)
        return True

    return pred


def resolve_backbone_prefix(params, backbone_key: str = "backbone"):
    """Path segments leading to the backbone subtree: ("backbone",) on a bare
    segmentor, ("model", "backbone") under the DomainGeneral wrapper."""
    if backbone_key in params:
        return (backbone_key,)
    for k, v in params.items():
        if isinstance(v, dict) and backbone_key in v:
            return (k, backbone_key)
    if "model" in params:
        # wrapper tree whose trainable partition holds no backbone params
        # (fully frozen backbone) — the backbone still lives under model/
        return ("model", backbone_key)
    return (backbone_key,)


def nest_under(prefix, tree):
    """Wrap `tree` in nested dicts along `prefix` segments."""
    for seg in reversed(tuple(prefix)):
        tree = {seg: tree}
    return tree


def partition_params(params, pred: Callable[[str], bool]):
    """Split a param tree into (trainable, frozen) trees by path predicate."""
    flat = _flat(params)
    trainable = {k: v for k, v in flat.items() if pred(k)}
    frozen = {k: v for k, v in flat.items() if not pred(k)}
    return _unflat(trainable) if trainable else {}, _unflat(frozen) if frozen else {}


def merge_params(trainable, frozen):
    flat = _flat(frozen) if frozen else {}
    flat.update(_flat(trainable) if trainable else {})
    return _unflat(flat)


def poly_schedule(base_lr: float, power: float = 0.9, max_steps: int = 40000,
                  eta_min: float = 0.0, warmup_steps: int = 0,
                  warmup_start_factor: float = 1e-6) -> optax.Schedule:
    """PolyLR (power 0.9 over max_steps) with optional linear warmup
    (configs/_base_/schedules/schedule_40k.py:1-11)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / max_steps, 0.0, 1.0)
        lr = (base_lr - eta_min) * (1.0 - frac) ** power + eta_min
        if warmup_steps > 0:
            wfrac = jnp.clip(step / warmup_steps, 0.0, 1.0)
            wmult = warmup_start_factor + (1.0 - warmup_start_factor) * wfrac
            lr = lr * wmult
        return lr

    return sched


def decay_mask(params) -> dict:
    flat = _flat(params)
    mask = {
        k: (v.ndim >= 2 and not any(s in k for s in NO_DECAY_KEYWORDS))
        for k, v in flat.items()
    }
    return _unflat(mask)


def make_optimizer(
    params,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    max_steps: int = 40000,
    power: float = 0.9,
    warmup_steps: int = 0,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW + PolyLR over the *trainable* partition."""
    sched = poly_schedule(base_lr, power, max_steps, warmup_steps=warmup_steps)
    tx = optax.adamw(
        learning_rate=sched, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay, mask=decay_mask(params),
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
