"""Unified Vision Transformer core.

One configurable ViT replaces the reference's four vendored backbone files
(rein/models/backbones/{dino_v2,eva_02,clip,sam_vit}.py — SURVEY §7.1 "One
ViT core"): DINOv2 / EVA02 / CLIP / SAM are parameterizations (position
embedding kind, FFN kind, RoPE, windowing, pre/post-LN) constructed by the
factories in dinov2.py / eva02.py / clip.py / sam.py.

TPU-first choices:
  * NHWC layouts, static shapes; pos-embed interpolation is resolved at trace
    time per static input size (mirrors dino_v2.py:184-215 numerics, incl.
    the +0.1 scale-factor trick, via ops/resize torch-parity bicubic).
  * attention runs through ops.multi_head_attention (Pallas flash kernel on
    TPU, fused XLA elsewhere).
  * adapters (LoRA / Rein) are param-tree overlays, not module surgery.
  * per-block remat is available for memory-bound training.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfmseg_tpu.models.backbones.adapters import (
    LoRASpec,
    Reins,
    ReinsSpec,
    make_dense,
    make_headmajor_dense,
)
from vfmseg_tpu.ops.attention import (
    multi_head_attention_headmajor,
    multi_head_attention_qkv_tm,
)
from vfmseg_tpu.ops.norm import LayerNorm
from vfmseg_tpu.ops.resize import resize


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    img_size: int = 512
    out_indices: Tuple[int, ...] = (7, 11, 15, 23)
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    # FFN family: "mlp" (DINOv2/CLIP), "swiglu" (DINOv2-g fused w12),
    # "swiglu_eva" (EVA02: w1/w2 + sub-LN + w3, eva_02.py:204-242)
    ffn_layer: str = "mlp"
    # "gelu" exact (DINOv2/EVA) or "quick_gelu" x*sigmoid(1.702x) (CLIP,
    # clip.py:18-20)
    ffn_act: str = "gelu"
    # CLIP-style stem: ln_pre after pos-add (clip.py:210,345-347) and the
    # class-embedding quirk where pos[0] gets class_embedding added again
    # (clip.py:330-341)
    pre_norm: bool = False
    cls_style: str = "token"  # "token" | "clip_embed"
    pos_interp: str = "bicubic"  # pos-embed resize kernel at off-size
    patch_embed_bias: bool = True  # CLIP conv1 has no bias (clip.py:195-201)
    init_values: Optional[float] = 1e-5  # LayerScale; None disables
    drop_path_rate: float = 0.0
    ln_eps: float = 1e-6
    num_cls_tokens: int = 1  # 0 => no cls token (SAM)
    # "learned": cls+grid with bicubic interp at off-size (dino_v2.py:184-215)
    # "learned_2d": grid-only [gh, gw, C] (SAM); "none": RoPE-only
    pos_embed: str = "learned"
    final_norm: bool = False  # DINOv2 collects pre-norm features
    # attention family: "fused" (single qkv linear) or "split_subln"
    # (EVA02 sub-LN: separate q/k/v projections, k without bias,
    # eva_02.py:271-283,336-346)
    attn_type: str = "fused"
    qk_scale: Optional[float] = None
    # EVA02 2D rotary embedding on q/k patch tokens (eva_02.py:119-161)
    use_rope: bool = False
    rope_pt_seq_len: int = 16
    rope_intp_freq: bool = True
    # SAM-style windowed attention: window size and the block indices that
    # attend globally (sam_vit.py:111-125). None disables windowing.
    window_size: Optional[int] = None
    global_attn_indexes: Tuple[int, ...] = ()
    # SAM decomposed relative position attention (sam_vit.py:392-432);
    # global blocks size their tables by the pretrain grid (1024/16 = 64)
    use_rel_pos: bool = False
    rel_pos_pretrain_extent: int = 64
    # fake a 4-scale pyramid from the /16 maps: x4, x2, x1, x0.5 bilinear
    # (dino_v2.py:332-355, reins_eva_02.py:40-48) — used by Mask2Former heads
    resize_feat: bool = False
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Any = jnp.float32


class Mlp(nn.Module):
    hidden: int
    out: int
    use_bias: bool = True
    act: str = "gelu"
    lora: Optional[LoRASpec] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = make_dense("fc1", self.hidden, self.use_bias, self.lora, self.dtype)(
            x, deterministic=deterministic)
        if self.act == "quick_gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            # exact erf GELU matches torch nn.GELU (parity default); the tanh
            # approximation is ~1.4x faster on the TPU VPU (fp32 erf costs
            # ~30% of the whole MLP) and differs by <1e-3 — opt in for
            # production inference via act="gelu_tanh" or VFMSEG_GELU_APPROX=1
            import os

            approx = (self.act == "gelu_tanh"
                      or os.environ.get("VFMSEG_GELU_APPROX", "0") == "1")
            x = nn.gelu(x, approximate=approx)
        return make_dense("fc2", self.out, self.use_bias, self.lora, self.dtype)(
            x, deterministic=deterministic)


class SwiGLU(nn.Module):
    """DINOv2 SwiGLUFFNFused-style gated FFN (dino_layers/swiglu_ffn.py)."""

    hidden: int
    out: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x12 = nn.Dense(2 * self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                       name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.out, use_bias=self.use_bias, dtype=self.dtype,
                        name="w3")(nn.silu(x1) * x2)


class SwiGLUEva(nn.Module):
    """EVA02 SwiGLU: silu(w1 x) * (w2 x) -> sub-LN -> w3 (eva_02.py:204-242)."""

    hidden: int
    out: int
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = nn.Dense(self.hidden, dtype=self.dtype, name="w1")(x)
        x2 = nn.Dense(self.hidden, dtype=self.dtype, name="w2")(x)
        h = nn.silu(x1) * x2
        h = LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ffn_ln")(h)
        return nn.Dense(self.out, dtype=self.dtype, name="w3")(h)


class Attention(nn.Module):
    """MHA: fused qkv (DINOv2) or split q/k/v with sub-LN conventions
    (EVA02), optional 2D RoPE on patch tokens, optional LoRA overlays."""

    cfg: ViTConfig
    lora: Optional[LoRASpec] = None
    # rel-pos table length (2*extent-1); SAM global blocks carry the
    # pretrain-grid-sized table (sam_vit.py:260-275)
    rel_pos_len: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 rope_cs: Optional[Tuple[jax.Array, jax.Array]] = None,
                 hw: Optional[Tuple[int, int]] = None):
        cfg = self.cfg
        b, n, c = x.shape
        dim = cfg.embed_dim
        head_dim = dim // cfg.num_heads
        # Layout strategy (measured on v5e, see ops/flash_attention.py):
        #   * fused qkv without rel-pos bias (DINOv2/CLIP): ONE natural-
        #     layout [E, 3HD] matmul, and the flash kernel reads q/k/v as
        #     lane-offset views of its output — zero HBM layout ops.
        #   * SAM (rel-pos bias) and EVA02 (split projections + RoPE):
        #     per-slot head-major einsums feeding the [B, H, N, D] paths.
        # (RoPE must rotate q/k BEFORE the score matmul, so the direct-qkv
        # kernel — which never materializes per-slot q/k — cannot serve
        # fused+RoPE configs like build_eva02(subln=False); those take the
        # head-major branch below, which applies rope_cs correctly.)
        if cfg.attn_type == "fused" and not cfg.use_rel_pos \
                and not cfg.use_rope:
            qkv = make_dense("qkv", 3 * dim, cfg.qkv_bias, self.lora,
                             cfg.dtype)(x, deterministic=deterministic)
            # token-major [B, N, E] output: attention feeds the proj matmul
            # in its natural layout (no per-block transpose relayout)
            out = multi_head_attention_qkv_tm(
                qkv, cfg.num_heads, scale=cfg.qk_scale, impl=cfg.attn_impl)
            return make_dense("proj", dim, cfg.proj_bias, self.lora,
                              cfg.dtype)(out, deterministic=deterministic)
        # EVA02 fused+rope eval path: the three split projections share one
        # input, so their kernels CONCATENATE into a single [E, 3E] matmul
        # — the same fused-qkv layout the token-major TAV flash primal
        # consumes — with q/k columns permuted to the evens|odds rope
        # convention and the rotation applied INSIDE the kernel
        # (ops/rope.py, flash_attention.py rope=True). Scores are invariant
        # under the joint q/k column permutation; v/proj keep the natural
        # layout. Eval-only (deterministic): the LoRA fold must be exact,
        # and the rope kernel path is primal-only (training keeps the
        # head-major rope path with its flash backward).
        import os as _os

        if (cfg.attn_type == "split_subln" and cfg.use_rope
                and rope_cs is not None and not cfg.use_rel_pos
                and deterministic and cfg.num_heads % 2 == 0
                and _os.environ.get("VFMSEG_EVA_FUSED_ROPE", "1") != "0"):
            from vfmseg_tpu.ops.rope import (
                evens_odds_perm, permuted_rope_tables)

            wq, bq = make_headmajor_dense(
                "q_proj", cfg.num_heads, head_dim, 1, cfg.qkv_bias,
                self.lora, cfg.dtype)(x, deterministic=True, raw=True)
            wk, _bk = make_headmajor_dense(
                "k_proj", cfg.num_heads, head_dim, 1, False, self.lora,
                cfg.dtype)(x, deterministic=True, raw=True)
            wv, bv = make_headmajor_dense(
                "v_proj", cfg.num_heads, head_dim, 1, cfg.qkv_bias,
                self.lora, cfg.dtype)(x, deterministic=True, raw=True)
            pc = evens_odds_perm(cfg.num_heads, head_dim)
            w_f = jnp.concatenate([wq[:, pc], wk[:, pc], wv], axis=1)
            qkv = jax.lax.dot_general(
                x, w_f, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cfg.dtype)
            if bq is not None or bv is not None:
                zeros = jnp.zeros((dim,), cfg.dtype)
                b_f = jnp.concatenate([
                    bq[pc] if bq is not None else zeros, zeros,
                    bv if bv is not None else zeros])
                qkv = qkv + b_f
            cosP, sinP = permuted_rope_tables(rope_cs[0], rope_cs[1])
            out = multi_head_attention_qkv_tm(
                qkv, cfg.num_heads, scale=cfg.qk_scale, impl=cfg.attn_impl,
                rope_cs=(jnp.asarray(cosP, jnp.float32),
                         jnp.asarray(sinP, jnp.float32)))
            return make_dense("proj", dim, cfg.proj_bias, self.lora,
                              cfg.dtype)(out, deterministic=deterministic)

        if cfg.attn_type == "fused":
            q, k, v = make_headmajor_dense(
                "qkv", cfg.num_heads, head_dim, 3, cfg.qkv_bias, self.lora,
                cfg.dtype)(x, deterministic=deterministic)
        elif cfg.attn_type == "split_subln":
            # EVA02: q and v carry biases, k does not (eva_02.py:271-283)
            q = make_headmajor_dense(
                "q_proj", cfg.num_heads, head_dim, 1, cfg.qkv_bias, self.lora,
                cfg.dtype)(x, deterministic=deterministic)
            k = make_headmajor_dense(
                "k_proj", cfg.num_heads, head_dim, 1, False, self.lora,
                cfg.dtype)(x, deterministic=deterministic)
            v = make_headmajor_dense(
                "v_proj", cfg.num_heads, head_dim, 1, cfg.qkv_bias, self.lora,
                cfg.dtype)(x, deterministic=deterministic)
        else:
            raise ValueError(f"unknown attn_type {cfg.attn_type!r}")

        if rope_cs is not None:
            # rope_cs covers ALL tokens: cls positions carry identity rows
            # (cos=1, sin=0 — padded once at table construction), NOT a
            # slice+concat along the token axis — t[:, :, p:] breaks (8,128)
            # tile alignment for every downstream op (measured 1.5 ms/block
            # on v5e, ~half the EVA02-vs-DINOv2 block-time gap).
            cos = rope_cs[0].astype(q.dtype)[None, None, :, :]
            sin = rope_cs[1].astype(q.dtype)[None, None, :, :]
            from vfmseg_tpu.ops.rope import rotate_half_mxu

            def rot(t):
                return t * cos + rotate_half_mxu(t) * sin

            q, k = rot(q), rot(k)

        if cfg.use_rel_pos:
            from vfmseg_tpu.ops.window import (
                decomposed_rel_pos_bias_hm, decomposed_rel_pos_terms_hm)

            head_dim_ = cfg.embed_dim // cfg.num_heads
            rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                                   (self.rel_pos_len, head_dim_))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                                   (self.rel_pos_len, head_dim_))
            if cfg.attn_impl == "pallas_bias":
                # opt-in memory path: materialized bias + flash dbias kernel
                bias = decomposed_rel_pos_bias_hm(
                    q, rel_pos_h.astype(cfg.dtype),
                    rel_pos_w.astype(cfg.dtype), hw)
                out = multi_head_attention_headmajor(
                    q, k, v, scale=cfg.qk_scale, bias=bias,
                    impl=cfg.attn_impl)
            else:
                # default: k-separable bias terms — no [B, H, N, N] bias
                # tensor; on TPU the flash kernel also keeps the logits in
                # VMEM (multi_head_attention_decomposed_hm)
                rel_h, rel_w = decomposed_rel_pos_terms_hm(
                    q, rel_pos_h.astype(cfg.dtype),
                    rel_pos_w.astype(cfg.dtype), hw)
                from vfmseg_tpu.ops.attention import (
                    multi_head_attention_decomposed_hm)

                out = multi_head_attention_decomposed_hm(
                    q, k, v, rel_h, rel_w, scale=cfg.qk_scale,
                    impl=cfg.attn_impl)
        else:
            out = multi_head_attention_headmajor(
                q, k, v, scale=cfg.qk_scale, bias=None, impl=cfg.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return make_dense("proj", dim, cfg.proj_bias, self.lora, cfg.dtype)(
            out, deterministic=deterministic
        )


class LayerScale(nn.Module):
    dim: int
    init_values: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_values),
                           (self.dim,))
        return x * gamma.astype(self.dtype)


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng) -> jax.Array:
    """Stochastic depth on the residual branch (dino_layers/drop_path.py)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-LN transformer block with LayerScale (dino_layers/block.py:43-110)."""

    cfg: ViTConfig
    drop_path_rate: float = 0.0
    lora: Optional[LoRASpec] = None
    window_size: int = 0  # SAM windowed block (0 = global)
    rel_pos_pretrain_extent: int = 0  # grid size of pretrained rel-pos table

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rope_cs=None,
                 hw: Optional[Tuple[int, int]] = None):
        cfg = self.cfg

        def _residual(branch):
            if deterministic or self.drop_path_rate == 0.0:
                return branch
            rng = self.make_rng("dropout")
            return drop_path(branch, self.drop_path_rate, deterministic, rng)

        rel_pos_len = 0
        if cfg.use_rel_pos:
            extent = self.window_size or self.rel_pos_pretrain_extent
            rel_pos_len = 2 * extent - 1

        h = LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm1")(x)
        attn = Attention(cfg=cfg, lora=self.lora, rel_pos_len=rel_pos_len,
                         name="attn")
        if self.window_size:
            # partition around attention only (sam_vit.py:201-215)
            from vfmseg_tpu.ops.window import window_partition, window_unpartition

            b, n, c = h.shape
            gh, gw = hw
            ws = self.window_size
            h2d, pad_hw = window_partition(h.reshape(b, gh, gw, c), ws)
            hseq = h2d.reshape(-1, ws * ws, c)
            hseq = attn(hseq, deterministic=deterministic, hw=(ws, ws))
            h2d = window_unpartition(hseq.reshape(-1, ws, ws, c), ws, pad_hw,
                                     (gh, gw))
            h = h2d.reshape(b, gh * gw, c)
        else:
            h = attn(h, deterministic=deterministic, rope_cs=rope_cs, hw=hw)
        if cfg.init_values is not None:
            h = LayerScale(cfg.embed_dim, cfg.init_values, cfg.dtype, name="ls1")(h)
        x = x + _residual(h)

        h = LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm2")(x)
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        if cfg.ffn_layer == "mlp":
            h = Mlp(hidden, cfg.embed_dim, cfg.ffn_bias, cfg.ffn_act,
                    self.lora, cfg.dtype, name="mlp")(h, deterministic)
        elif cfg.ffn_layer == "swiglu":
            swiglu_hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            h = SwiGLU(swiglu_hidden, cfg.embed_dim, cfg.ffn_bias, cfg.dtype,
                       name="mlp")(h)
        elif cfg.ffn_layer == "swiglu_eva":
            h = SwiGLUEva(hidden, cfg.embed_dim, cfg.ln_eps, cfg.dtype,
                          name="mlp")(h)
        else:
            raise ValueError(f"unknown ffn_layer {cfg.ffn_layer!r}")
        if cfg.init_values is not None:
            h = LayerScale(cfg.embed_dim, cfg.init_values, cfg.dtype, name="ls2")(h)
        return x + _residual(h)


class VisionTransformer(nn.Module):
    """ViT backbone emitting 4 spatial feature maps [B, H/p, W/p, C].

    Mirrors the reference contract (SURVEY §2.3: every backbone emits a tuple
    of 4 maps from intermediate blocks) plus an optional Rein query vector
    when a ReinsSpec is configured (reins_dinov2.py:22-34).
    """

    cfg: ViTConfig
    lora: Optional[LoRASpec] = None
    reins: Optional[ReinsSpec] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        b, h, w, _ = x.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=cfg.patch_embed_bias, dtype=cfg.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, cfg.embed_dim)

        cls_param = None
        if cfg.num_cls_tokens:
            if cfg.cls_style == "clip_embed":
                cls_param = self.param(
                    "class_embedding",
                    nn.initializers.normal(cfg.embed_dim**-0.5),
                    (cfg.embed_dim,),
                )
                cls = cls_param.reshape(1, 1, cfg.embed_dim)
            else:
                cls = self.param(
                    "cls_token", nn.initializers.truncated_normal(0.02),
                    (1, cfg.num_cls_tokens, cfg.embed_dim),
                )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype),
                                  (b, cfg.num_cls_tokens, cfg.embed_dim)), x],
                axis=1,
            )

        if cfg.pos_embed == "learned":
            pos = self._interpolated_pos_embed(gh, gw)
            if cfg.cls_style == "clip_embed":
                # CLIP quirk: cls position gets class_embedding added again
                # (clip.py:334-341)
                pos = jnp.asarray(pos).at[:, 0].add(cls_param)
            x = x + pos.astype(x.dtype)
        elif cfg.pos_embed == "learned_2d":
            # SAM: grid-shaped absolute pos embed, no cls (sam_vit.py:102-109)
            side = cfg.img_size // cfg.patch_size
            pos2d = self.param(
                "pos_embed", nn.initializers.zeros,
                (1, side, side, cfg.embed_dim))
            if (gh, gw) != (side, side):
                from vfmseg_tpu.ops.resize import resize as _resize

                pos2d = _resize(pos2d.astype(jnp.float32), size=(gh, gw),
                                method="bilinear")
            x = x + pos2d.reshape(1, gh * gw, cfg.embed_dim).astype(x.dtype)

        if cfg.pre_norm:
            x = LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="ln_pre")(x)

        rein_mod = None
        if self.reins is not None:
            rein_mod = Reins(
                spec=self.reins, num_layers=cfg.depth, embed_dims=cfg.embed_dim,
                patch_size=cfg.patch_size, dtype=cfg.dtype, name="reins",
            )

        rope_cs = None
        if cfg.use_rope:
            import numpy as np

            from vfmseg_tpu.ops.rope import rope_2d_tables

            cos, sin = rope_2d_tables(
                gh, gw, cfg.embed_dim // cfg.num_heads,
                pt_seq_len=cfg.rope_pt_seq_len, intp_freq=cfg.rope_intp_freq)
            # cls tokens bypass rotation (eva_02.py:362-369) via identity
            # rows (cos=1, sin=0) so the blocks never slice/concat the token
            # axis; built once here, shared by all blocks
            p = cfg.num_cls_tokens
            if p:
                cos = np.concatenate(
                    [np.ones((p, cos.shape[-1]), cos.dtype), cos], axis=0)
                sin = np.concatenate(
                    [np.zeros((p, sin.shape[-1]), sin.dtype), sin], axis=0)
            rope_cs = (jnp.asarray(cos), jnp.asarray(sin))

        dpr = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1) for i in range(cfg.depth)
        ]
        block_cls = Block
        if cfg.remat:
            block_cls = nn.remat(Block, static_argnums=(1, 3))
        out_norm = (
            LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm")
            if cfg.final_norm else None
        )
        outs = []
        for i in range(cfg.depth):
            ws = 0
            if cfg.window_size and i not in cfg.global_attn_indexes:
                ws = cfg.window_size
            x = block_cls(
                cfg=cfg, drop_path_rate=dpr[i], lora=self.lora,
                window_size=ws,
                rel_pos_pretrain_extent=cfg.rel_pos_pretrain_extent,
                name=f"blocks_{i}",
            )(x, deterministic, rope_cs, (gh, gw))
            if rein_mod is not None and (
                self.reins.apply_indices is None or i in self.reins.apply_indices
            ):
                x = rein_mod.adapt(x, i, num_prefix_tokens=cfg.num_cls_tokens)
            if i in cfg.out_indices:
                feat = out_norm(x) if out_norm is not None else x
                feat = feat[:, cfg.num_cls_tokens:, :].reshape(
                    b, gh, gw, cfg.embed_dim)
                outs.append(feat)

        feats = outs
        if cfg.resize_feat and len(feats) == 4:
            from vfmseg_tpu.ops.resize import resize as _resize

            feats = [
                _resize(feats[0], scale_factor=4.0, method="bilinear"),
                _resize(feats[1], scale_factor=2.0, method="bilinear"),
                feats[2],
                _resize(feats[3], scale_factor=0.5, method="bilinear"),
            ]
        feats = tuple(feats)
        if rein_mod is not None and self.reins.link_token_to_query:
            return feats, rein_mod.queries()
        return feats

    def _interpolated_pos_embed(self, gh: int, gw: int) -> jax.Array:
        """Reference-faithful pos-embed interpolation, static per (gh, gw).

        DINOv2 (pos_interp="bicubic"): torch bicubic (a=-0.75) with the +0.1
        scale-factor trick on the grid part (dino_v2.py:184-215). CLIP
        (pos_interp="bilinear"): plain size-based bilinear every forward
        (clip.py:334-345). cls positions pass through either way."""
        cfg = self.cfg
        n_grid = (cfg.img_size // cfg.patch_size) ** 2
        n_prefix = cfg.num_cls_tokens
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, n_grid + n_prefix, cfg.embed_dim),
        )
        side = int(math.sqrt(n_grid))
        if (gh, gw) == (side, side):
            return pos
        prefix, grid = pos[:, :n_prefix], pos[:, n_prefix:]
        grid = grid.reshape(1, side, side, cfg.embed_dim)
        from vfmseg_tpu.ops.resize import _apply_separable  # internal, static

        if cfg.pos_interp == "bicubic":
            scales = ((gh + 0.1) / side, (gw + 0.1) / side)
        else:
            scales = (None, None)
        grid = _apply_separable(
            grid.astype(jnp.float32), (gh, gw), cfg.pos_interp, False, scales)
        grid = grid.reshape(1, gh * gw, cfg.embed_dim)
        if n_prefix:
            return jnp.concatenate([prefix, grid.astype(pos.dtype)], axis=1)
        return grid.astype(pos.dtype)
