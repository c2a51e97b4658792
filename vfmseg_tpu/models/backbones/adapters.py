"""Parameter-efficient adapters: LoRA linear layers and Rein token adapters.

LoRA mirrors the reference's HF-peft wrapping of backbone linears
(rein/models/backbones/lora_backbone.py:15-23: LoraConfig(r, lora_alpha,
target_modules, lora_dropout, bias='none'); peft inits lora_A with
kaiming_uniform(a=sqrt(5)) and lora_B with zeros, scaling alpha/r).

Rein mirrors rein/models/backbones/reins.py: a per-layer learnable token bank
attends into the patch tokens between transformer blocks and emits per-layer
query vectors for Mask2Former-style heads (reins.py:61-116). LoRAReins
factorizes the bank into A·B (reins.py:119-148).

Here adapters are *param-tree overlays*: extra leaves whose path contains
"lora"/"reins", selected for training by path predicates (train/optim.py) —
the functional analogue of the reference's requires_grad surgery
(rein/models/backbones/utils.py:9-32).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    """Which linears get LoRA and with what shape (reference Lora_config)."""

    rank: int = 0
    alpha: float = 1.0
    dropout: float = 0.0
    targets: Tuple[str, ...] = ()  # linear module names, e.g. ("qkv",)

    def applies_to(self, name: str) -> bool:
        return self.rank > 0 and name in self.targets


def _kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """peft's lora_A init: kaiming_uniform(a=sqrt(5)) on a [out,in] torch
    weight == uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)). Our kernel is [in,out]
    so fan_in = shape[0]."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class LoRADense(nn.Module):
    """Dense layer with an optional low-rank residual branch.

    y = x W + b + dropout(x) A B * (alpha / rank)
    """

    features: int
    use_bias: bool = True
    rank: int = 0
    alpha: float = 1.0
    lora_dropout: float = 0.0
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features))
        if self.rank > 0 and (deterministic or self.lora_dropout == 0.0):
            # Dropout-free path: y = x(W + sAB) + b, folding the low-rank
            # update into the base kernel. The sequential form pays two
            # ACTIVATION-sized skinny GEMMs ([tokens, e] x [e, r] at 1/8
            # MXU depth and [tokens, r] x [r, F] at r/128 depth) — ~13 ms
            # per bs28 refine group on v5e, 7% of the ViT-L forward. The
            # fold is WEIGHT-sized ([e, r] x [r, F] + one add), ~100x
            # smaller here, and the main GEMM is unchanged. Mathematically
            # identical (fp32 fold; differs from the sequential form only
            # in rounding). Training with lora_dropout keeps the
            # sequential form — dropout acts on x before A.
            lora_a = self.param("lora_a", _kaiming_uniform_a5,
                                (in_features, self.rank))
            lora_b = self.param("lora_b", nn.initializers.zeros,
                                (self.rank, self.features))
            scaling = self.alpha / self.rank
            kern = (kernel.astype(jnp.float32)
                    + jnp.dot(lora_a.astype(jnp.float32),
                              lora_b.astype(jnp.float32)) * scaling
                    ).astype(self.dtype)
            y = jnp.dot(x, kern)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                y = y + bias.astype(self.dtype)
            return y
        y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        if self.rank > 0:
            lora_a = self.param("lora_a", _kaiming_uniform_a5, (in_features, self.rank))
            lora_b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features))
            xd = x
            if self.lora_dropout > 0.0 and not deterministic:
                xd = nn.Dropout(rate=self.lora_dropout)(xd, deterministic=False)
            scaling = self.alpha / self.rank
            y = y + jnp.dot(jnp.dot(xd, lora_a.astype(self.dtype)),
                            lora_b.astype(self.dtype)) * scaling
        return y


def make_dense(name: str, features: int, use_bias: bool, lora: Optional[LoRASpec],
               dtype: Any, kernel_init=nn.initializers.lecun_normal()) -> LoRADense:
    """Build a (possibly LoRA-augmented) Dense named `name`."""
    if lora is not None and lora.applies_to(name):
        return LoRADense(
            features=features, use_bias=use_bias, rank=lora.rank, alpha=lora.alpha,
            lora_dropout=lora.dropout, dtype=dtype, kernel_init=kernel_init, name=name,
        )
    return LoRADense(features=features, use_bias=use_bias, rank=0, dtype=dtype,
                     kernel_init=kernel_init, name=name)


class HeadMajorDense(nn.Module):
    """Projection(s) emitting head-major [B, H, N, D] slots directly.

    Param-tree compatible with ``LoRADense(features=slots*H*D)`` — identical
    kernel/bias/lora_a/lora_b shapes — but computed as one einsum per slot
    ("bne,ehd->bhnd") so q/k/v are born in the layout the flash kernel
    consumes: no [B, N, slots, H, D] tensor is ever sliced, transposed, or
    padded in HBM (measured ~32% of ViT-L stage-1 device time on v5e).
    `slots=3` covers DINOv2/CLIP/SAM's fused qkv; `slots=1` covers EVA02's
    split q/k/v projections (eva_02.py:271-283).
    """

    num_heads: int
    head_dim: int
    slots: int = 3
    use_bias: bool = True
    rank: int = 0
    alpha: float = 1.0
    lora_dropout: float = 0.0
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 raw: bool = False):
        b, n, e = x.shape
        hh, d, s = self.num_heads, self.head_dim, self.slots
        kernel = self.param("kernel", self.kernel_init, (e, s * hh * d))
        if raw:
            # raw weight access for caller-side fusion (the EVA02 fused+rope
            # eval path concatenates q/k/v kernels into ONE [E, 3E] matmul):
            # returns the LoRA-FOLDED (kernel [E, s*H*D], bias or None).
            # Only valid when folding is exact — eval, or dropout-free LoRA.
            assert deterministic or self.lora_dropout == 0.0 \
                or self.rank == 0, "raw weights need a dropout-free fold"
            kern = kernel.astype(self.dtype)
            if self.rank > 0:
                la = self.param("lora_a", _kaiming_uniform_a5, (e, self.rank))
                lb = self.param("lora_b", nn.initializers.zeros,
                                (self.rank, s * hh * d))
                kern = (kernel.astype(jnp.float32)
                        + jnp.dot(la.astype(jnp.float32),
                                  lb.astype(jnp.float32))
                        * (self.alpha / self.rank)).astype(self.dtype)
            raw_bias = None
            if self.use_bias:
                raw_bias = self.param("bias", nn.initializers.zeros,
                                      (s * hh * d,)).astype(self.dtype)
            return kern, raw_bias
        w = kernel.astype(self.dtype).reshape(e, s, hh, d)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (s * hh * d,))
            bias = bias.astype(self.dtype).reshape(s, hh, d)
        xa = scaling = wb = None
        if self.rank > 0:
            lora_a = self.param("lora_a", _kaiming_uniform_a5, (e, self.rank))
            lora_b = self.param("lora_b", nn.initializers.zeros,
                                (self.rank, s * hh * d))
            if deterministic or self.lora_dropout == 0.0:
                # dropout-free: fold W + sAB once (weight-sized work) —
                # see LoRADense; the per-slot einsums then run unchanged
                scaling = self.alpha / self.rank
                kern = (kernel.astype(jnp.float32)
                        + jnp.dot(lora_a.astype(jnp.float32),
                                  lora_b.astype(jnp.float32)) * scaling
                        ).astype(self.dtype)
                w = kern.reshape(e, s, hh, d)
                xa = scaling = wb = None
            else:
                wb = lora_b.astype(self.dtype).reshape(self.rank, s, hh, d)
                xd = x
                if self.lora_dropout > 0.0 and not deterministic:
                    xd = nn.Dropout(rate=self.lora_dropout)(
                        xd, deterministic=False)
                xa = jnp.dot(xd, lora_a.astype(self.dtype))
                scaling = self.alpha / self.rank
        outs = []
        for i in range(s):
            t = jnp.einsum("bne,ehd->bhnd", x, w[:, i],
                           preferred_element_type=jnp.float32).astype(self.dtype)
            if bias is not None:
                t = t + bias[i][None, :, None, :]
            if xa is not None:
                t = t + scaling * jnp.einsum(
                    "bnr,rhd->bhnd", xa, wb[:, i],
                    preferred_element_type=jnp.float32).astype(self.dtype)
            outs.append(t)
        return outs[0] if s == 1 else tuple(outs)


def make_headmajor_dense(name: str, num_heads: int, head_dim: int, slots: int,
                         use_bias: bool, lora: Optional[LoRASpec], dtype: Any,
                         ) -> HeadMajorDense:
    """Build a (possibly LoRA-augmented) head-major projection named `name`."""
    rank, alpha, dropout = 0, 1.0, 0.0
    if lora is not None and lora.applies_to(name):
        rank, alpha, dropout = lora.rank, lora.alpha, lora.dropout
    return HeadMajorDense(
        num_heads=num_heads, head_dim=head_dim, slots=slots, use_bias=use_bias,
        rank=rank, alpha=alpha, lora_dropout=dropout, dtype=dtype, name=name)


@dataclasses.dataclass(frozen=True)
class ReinsSpec:
    """Configuration of the Rein token adapter (reference reins.py:13-34)."""

    token_length: int = 100
    query_dims: int = 256
    use_softmax: bool = True
    link_token_to_query: bool = True
    scale_init: float = 0.001
    zero_mlp_delta_f: bool = False
    lora_dim: int = 0  # >0 => LoRAReins factorized token bank
    # which block indices get the adapter (None = every block; SAM uses only
    # its global-attention blocks, reins_sam_vit.py:27-37)
    apply_indices: Optional[Tuple[int, ...]] = None


class Reins(nn.Module):
    """Rein adapter bank over all layers (reference reins.py:84-116).

    Token bank [L, T, D]; per layer: attn = softmax(feats tokens^T / sqrt(D)),
    delta = mlp_delta_f(attn[:, :, 1:] @ mlp_token2feat(tokens[1:]) + feats),
    feats += scale * delta (cls token bypasses).
    """

    spec: ReinsSpec
    num_layers: int
    embed_dims: int
    patch_size: int
    dtype: Any = jnp.float32

    def setup(self):
        s = self.spec
        # reference init: uniform(+-sqrt(6 / (3*p*p + d_term)))  (reins.py:44-52, 134-142)
        if s.lora_dim > 0:
            val = math.sqrt(6.0 / (3 * self.patch_size**2 +
                                   (self.embed_dims * s.lora_dim) ** 0.5))
            init = nn.initializers.uniform(scale=2 * val)  # uniform in [0, 2v]; shift below

            def uinit(key, shape, dtype=jnp.float32, v=val):
                return jax.random.uniform(key, shape, dtype, -v, v)

            self.learnable_tokens_a = self.param(
                "learnable_tokens_a", uinit,
                (self.num_layers, s.token_length, s.lora_dim))
            self.learnable_tokens_b = self.param(
                "learnable_tokens_b", uinit,
                (self.num_layers, s.lora_dim, self.embed_dims))
        else:
            val = math.sqrt(6.0 / (3 * self.patch_size**2 + self.embed_dims))

            def uinit(key, shape, dtype=jnp.float32, v=val):
                return jax.random.uniform(key, shape, dtype, -v, v)

            self.learnable_tokens = self.param(
                "learnable_tokens", uinit,
                (self.num_layers, s.token_length, self.embed_dims))
        if not s.zero_mlp_delta_f:
            self.scale = self.param("scale", nn.initializers.constant(s.scale_init), ())
        mlp_init = _kaiming_uniform_a5
        self.mlp_token2feat = nn.Dense(self.embed_dims, kernel_init=mlp_init,
                                       dtype=self.dtype, name="mlp_token2feat")
        delta_init = (nn.initializers.zeros if s.zero_mlp_delta_f else mlp_init)
        self.mlp_delta_f = nn.Dense(self.embed_dims, kernel_init=delta_init,
                                    dtype=self.dtype, name="mlp_delta_f")
        if s.link_token_to_query:
            self.transform = nn.Dense(s.query_dims, dtype=self.dtype, name="transform")
            self.merge = nn.Dense(s.query_dims, dtype=self.dtype, name="merge")

    def _tokens(self, layer: int) -> jax.Array:
        if self.spec.lora_dim > 0:
            if layer == -1:
                return jnp.einsum("ltr,lrd->ltd", self.learnable_tokens_a,
                                  self.learnable_tokens_b)
            return self.learnable_tokens_a[layer] @ self.learnable_tokens_b[layer]
        return self.learnable_tokens if layer == -1 else self.learnable_tokens[layer]

    def adapt(self, feats: jax.Array, layer: int, num_prefix_tokens: int = 1) -> jax.Array:
        """feats: [B, N, C] batch-first with `num_prefix_tokens` leading cls
        tokens that bypass the adapter (reins.py:89-100)."""
        prefix = feats[:, :num_prefix_tokens]
        x = feats[:, num_prefix_tokens:].astype(self.dtype)
        tokens = self._tokens(layer).astype(self.dtype)  # [T, C]
        attn = jnp.einsum("bnc,mc->bnm", x, tokens)
        if self.spec.use_softmax:
            attn = jax.nn.softmax(attn * (self.embed_dims**-0.5), axis=-1)
        delta = jnp.einsum("bnm,mc->bnc", attn[:, :, 1:],
                           self.mlp_token2feat(tokens[1:]))
        delta = self.mlp_delta_f(delta + x)
        scale = 1.0 if self.spec.zero_mlp_delta_f else self.scale
        x = x + scale * delta
        if num_prefix_tokens:
            x = jnp.concatenate([prefix, x.astype(prefix.dtype)], axis=1)
        return x

    def queries(self) -> Optional[jax.Array]:
        """Per return_auto (reins.py:61-75): [T, query_dims] query vector."""
        if not self.spec.link_token_to_query:
            return None
        tokens = self.transform(self._tokens(-1).astype(self.dtype))  # [L, T, Q]
        pooled = jnp.concatenate(
            [jnp.max(tokens, axis=0), jnp.mean(tokens, axis=0), tokens[-1]], axis=-1
        )  # [T, 3Q]
        return self.merge(pooled)
