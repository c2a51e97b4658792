"""Tests for attention and resize ops, including torch-parity goldens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfmseg_tpu.ops.attention import xla_attention
from vfmseg_tpu.ops.flash_attention import flash_attention
from vfmseg_tpu.ops.resize import nearest_downsample_2x, resize, resize_labels


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestAttention:
    def test_xla_attention_matches_naive(self):
        q, k, v = (_rand(i, (2, 17, 4, 8)) for i in range(3))
        out = xla_attention(q, k, v)
        scale = 8**-0.5
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        expect = np.einsum("bhqk,bkhd->bqhd", probs, v)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)

    def test_flash_matches_xla_interpret(self):
        """Pallas forward kernel in interpreter mode (runs on CPU CI; the
        real-TPU check lives in the verify skill)."""
        from jax.experimental.pallas import tpu as pltpu

        q, k, v = (_rand(i + 10, (1, 130, 2, 16)) for i in range(3))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_mha_same_shape_routes_qkv_tm_interpret(self):
        """multi_head_attention packs same-shape q/k/v (decoder self/cross
        attention, d=64) into the fused-qkv TAV primal; outputs must match
        the XLA path."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.attention import multi_head_attention

        q, k, v = (_rand(i + 40, (2, 130, 2, 64)) for i in range(3))
        with pltpu.force_tpu_interpret_mode():
            out = multi_head_attention(q, k, v, impl="pallas")
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_flash_relpos_matches_xla_decomposed_interpret(self):
        """SAM separable rel-pos flash kernel (bias tile rebuilt in-kernel
        from the k-separable terms) vs the XLA decomposed formulation, at a
        non-square grid and a non-aligned token count."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.attention import xla_attention_decomposed_hm
        from vfmseg_tpu.ops.flash_attention import flash_attention_relpos_hm

        kh, kw, d, heads = 6, 9, 16, 2
        n = kh * kw
        q, k, v = (_rand(i + 30, (2, heads, n, d)) for i in range(3))
        rel_h = _rand(40, (2, heads, n, kh))
        rel_w = _rand(41, (2, heads, n, kw))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_relpos_hm(q, k, v, rel_h, rel_w)
        ref = xla_attention_decomposed_hm(q, k, v, rel_h, rel_w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_flash_relpos_grad_matches_xla_decomposed(self):
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.attention import xla_attention_decomposed_hm
        from vfmseg_tpu.ops.flash_attention import flash_attention_relpos_hm

        kh, kw, d, heads = 4, 5, 8, 2
        n = kh * kw
        args = tuple(_rand(i + 50, (1, heads, n, d)) for i in range(3)) + (
            _rand(54, (1, heads, n, kh)), _rand(55, (1, heads, n, kw)))

        def f_flash(*a):
            return jnp.sum(flash_attention_relpos_hm(*a) ** 2)

        def f_xla(*a):
            return jnp.sum(xla_attention_decomposed_hm(*a) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(f_flash, argnums=tuple(range(5)))(*args)
        g2 = jax.grad(f_xla, argnums=tuple(range(5)))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_flash_grad_matches_xla(self):
        """Both backward kernels (dQ and dK/dV) in interpreter mode,
        including a non-block-aligned sequence length (padded rows)."""
        from jax.experimental.pallas import tpu as pltpu

        q, k, v = (_rand(i + 20, (2, 77, 2, 16)) for i in range(3))

        def f_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        def f_xla(q, k, v):
            return jnp.sum(xla_attention(q, k, v) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_flash_headmajor_matches_xla_interpret(self):
        """Head-major no-pad kernel: forward at a non-block-aligned length
        (Mosaic-padded tail blocks must be masked, not leak garbage)."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_headmajor

        q, k, v = (_rand(i + 40, (2, 3, 77, 16)) for i in range(3))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_headmajor(q, k, v)
        ref = xla_attention(*(t.transpose(0, 2, 1, 3) for t in (q, k, v)))
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref.transpose(0, 2, 1, 3)),
                                   rtol=2e-4, atol=2e-4)

    def test_flash_headmajor_grad_matches_xla(self):
        """Head-major backward kernels (dQ, dK/dV) with a ragged tail: the
        dkv kernel's q_len masking must zero Mosaic pad-row contributions."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_headmajor

        q, k, v = (_rand(i + 50, (2, 2, 77, 16)) for i in range(3))

        def f_flash(q, k, v):
            return jnp.sum(flash_attention_headmajor(q, k, v) ** 2)

        def f_xla(q, k, v):
            out = xla_attention(*(t.transpose(0, 2, 1, 3) for t in (q, k, v)))
            return jnp.sum(out ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_flash_bias_matches_xla_interpret(self):
        """Additive-bias path (SAM decomposed rel-pos shape), fwd + all four
        gradients incl. dbias, with non-block-aligned lengths and a
        broadcast (per-head-shared) bias."""
        from jax.experimental.pallas import tpu as pltpu

        q, k, v = (_rand(i + 30, (2, 77, 2, 16)) for i in range(3))
        bias = _rand(33, (2, 1, 77, 77)) * 0.5  # broadcasts over heads

        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, bias=jnp.asarray(bias))
        ref = xla_attention(q, k, v, bias=jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

        def f_flash(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias=bias) ** 2)

        def f_xla(q, k, v, bias):
            return jnp.sum(xla_attention(q, k, v, bias=bias) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(f_flash, argnums=(0, 1, 2, 3))(
                q, k, v, jnp.asarray(bias))
        g2 = jax.grad(f_xla, argnums=(0, 1, 2, 3))(q, k, v, jnp.asarray(bias))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_decomposed_bias_attention_matches_materialized(self):
        """xla_attention_decomposed_hm (SAM's default path) must equal the
        materialized-bias head-major attention, fwd and grad."""
        from vfmseg_tpu.ops.attention import (
            xla_attention_decomposed_hm, xla_attention_headmajor)
        from vfmseg_tpu.ops.window import (
            decomposed_rel_pos_bias_hm, decomposed_rel_pos_terms_hm)

        b, h, H, W, d = 2, 3, 4, 5, 8
        n = H * W
        q, k, v = (_rand(60 + i, (b, h, n, d)) for i in range(3))
        rph = _rand(70, (2 * H - 1, d))
        rpw = _rand(71, (2 * W - 1, d))

        def f_new(q):
            rh, rw = decomposed_rel_pos_terms_hm(q, rph, rpw, (H, W))
            return jnp.sum(xla_attention_decomposed_hm(q, k, v, rh, rw) ** 2)

        def f_old(q):
            bias = decomposed_rel_pos_bias_hm(q, rph, rpw, (H, W))
            return jnp.sum(xla_attention_headmajor(q, k, v, bias=bias) ** 2)

        np.testing.assert_allclose(float(f_new(q)), float(f_old(q)),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jax.grad(f_new)(q)), np.asarray(jax.grad(f_old)(q)),
            rtol=1e-4, atol=1e-4)

    def test_flash_cross_attention_bias(self):
        """Nq != Nk with bias (decoder-style cross attention)."""
        from jax.experimental.pallas import tpu as pltpu

        q = _rand(40, (1, 19, 2, 16))
        k = _rand(41, (1, 53, 2, 16))
        v = _rand(42, (1, 53, 2, 16))
        bias = _rand(43, (1, 2, 19, 53))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, bias=bias)
        ref = xla_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


torch = pytest.importorskip("torch")


class TestResizeTorchParity:
    """resize must match torch F.interpolate (reference numerics, SURVEY §7.3)."""

    @pytest.mark.parametrize("in_hw,out_hw", [((8, 12), (16, 24)),
                                              ((16, 24), (8, 12)),
                                              ((7, 9), (20, 5))])
    def test_bilinear_size(self, in_hw, out_hw):
        x = np.random.RandomState(0).rand(2, *in_hw, 3).astype(np.float32)
        ours = resize(jnp.asarray(x), size=out_hw, method="bilinear")
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, size=out_hw, mode="bilinear", align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_bilinear_scale_factor(self):
        x = np.random.RandomState(1).rand(1, 10, 14, 4).astype(np.float32)
        ours = resize(jnp.asarray(x), scale_factor=0.5, method="bilinear")
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, scale_factor=0.5, mode="bilinear", align_corners=False,
            recompute_scale_factor=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_bilinear_align_corners(self):
        x = np.random.RandomState(2).rand(1, 6, 6, 2).astype(np.float32)
        ours = resize(jnp.asarray(x), size=(13, 9), method="bilinear",
                      align_corners=True)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, size=(13, 9), mode="bilinear", align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_bicubic_matches_torch(self):
        """Pos-embed interpolation path: torch bicubic uses a=-0.75."""
        x = np.random.RandomState(3).rand(1, 8, 8, 16).astype(np.float32)
        ours = resize(jnp.asarray(x), size=(11, 23), method="bicubic")
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, size=(11, 23), mode="bicubic", align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)

    def test_bicubic_scale_factor_plus_point1(self):
        """The DINOv2 +0.1 trick (dino_v2.py:196-207) exactly."""
        side, gh, gw = 8, 13, 5
        x = np.random.RandomState(4).rand(1, side, side, 8).astype(np.float32)
        from vfmseg_tpu.ops.resize import _apply_separable

        ours = _apply_separable(
            jnp.asarray(x), (gh, gw), "bicubic", False,
            ((gh + 0.1) / side, (gw + 0.1) / side))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, scale_factor=((gh + 0.1) / side, (gw + 0.1) / side),
            mode="bicubic", recompute_scale_factor=False)
        assert ref.shape[-2:] == (gh, gw)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)

    def test_nearest_downsample_matches_torch(self):
        lab = np.random.RandomState(5).randint(0, 19, (2, 16, 16)).astype(np.int64)
        ours = nearest_downsample_2x(jnp.asarray(lab))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(lab)[:, None].float(), scale_factor=0.5,
            mode="nearest")[:, 0].long().numpy()
        np.testing.assert_array_equal(np.asarray(ours), ref)

    def test_nearest_resize_labels(self):
        lab = np.random.RandomState(6).randint(0, 19, (1, 10, 14)).astype(np.int64)
        ours = resize_labels(jnp.asarray(lab), (25, 7))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(lab)[:, None].float(), size=(25, 7),
            mode="nearest")[:, 0].long().numpy()
        np.testing.assert_array_equal(np.asarray(ours), ref)


class TestDeformSampling:
    def test_matmul_sampling_matches_gather(self):
        from vfmseg_tpu.ops.deform_attn import (
            bilinear_sample_matmul, bilinear_sample_nhwc)

        value = _rand(0, (3, 7, 9, 5))
        # locations incl. out-of-range (zero-padding semantics)
        loc = jnp.asarray(_rand(1, (3, 40, 2))) * 1.4 - 0.2
        a = bilinear_sample_nhwc(jnp.asarray(value), loc)
        b = bilinear_sample_matmul(jnp.asarray(value), loc)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_pallas_sampling_matches_gather_interpret(self):
        """The VMEM-fused sampler (eval hot path for the Mask2Former pixel
        decoder) in interpreter mode, incl. out-of-range zero padding and a
        non-block-aligned sample count."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.deform_attn import (
            _sample_nhwc_xy, _sample_pallas)

        value = jnp.asarray(_rand(0, (3, 7, 9, 5)))
        loc = jnp.asarray(_rand(1, (3, 40, 2))) * 1.4 - 0.2
        xn, yn = loc[..., 0], loc[..., 1]
        with pltpu.force_tpu_interpret_mode():
            a = _sample_pallas(value, xn, yn)
        b = _sample_nhwc_xy(value, xn, yn)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_pallas_sampling_grad_matches_gather_interpret(self):
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.deform_attn import (
            _sample_nhwc_xy, _sample_pallas)

        value = jnp.asarray(_rand(2, (2, 6, 6, 4)))
        loc = jnp.asarray(_rand(3, (2, 25, 2))) * 0.9 + 0.05
        xn, yn = loc[..., 0], loc[..., 1]

        with pltpu.force_tpu_interpret_mode():
            ga = jax.grad(
                lambda v, x, y: jnp.sum(_sample_pallas(v, x, y) ** 2),
                argnums=(0, 1, 2))(value, xn, yn)
        gb = jax.grad(
            lambda v, x, y: jnp.sum(_sample_nhwc_xy(v, x, y) ** 2),
            argnums=(0, 1, 2))(value, xn, yn)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_matmul_sampling_grad_matches_gather(self):
        from vfmseg_tpu.ops.deform_attn import (
            bilinear_sample_matmul, bilinear_sample_nhwc)

        value = jnp.asarray(_rand(2, (2, 6, 6, 4)))
        loc = jnp.asarray(_rand(3, (2, 25, 2))) * 0.9 + 0.05

        ga = jax.grad(lambda v, l: jnp.sum(bilinear_sample_nhwc(v, l) ** 2),
                      argnums=(0, 1))(value, loc)
        gb = jax.grad(lambda v, l: jnp.sum(bilinear_sample_matmul(v, l) ** 2),
                      argnums=(0, 1))(value, loc)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestLayerNorm:
    def test_pallas_ln_matches_reference_interpret(self):
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.norm import _ln, _ln_reference

        x = _rand(60, (2, 77, 96))
        scale = _rand(61, (96,)) * 0.1 + 1.0
        bias = _rand(62, (96,)) * 0.1
        with pltpu.force_tpu_interpret_mode():
            y = _ln(x, scale, bias, 1e-6)
        ref = _ln_reference(x, scale, bias, 1e-6)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shape", [(2, 64, 96), (2, 65, 96),
                                       (3, 5, 33, 96), (130, 96)])
    def test_pallas_ln_shape_branches(self, shape):
        """Aligned rows take the 2D flatten; unaligned [.., N, C] with
        N % 8 != 0 take the native-3D kernel. Both must match reference."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.norm import _ln, _ln_reference

        x = _rand(70, shape)
        scale = _rand(71, (96,)) * 0.1 + 1.0
        bias = _rand(72, (96,)) * 0.1
        with pltpu.force_tpu_interpret_mode():
            y = _ln(x, scale, bias, 1e-6)
        ref = _ln_reference(x, scale, bias, 1e-6)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_ln_grad_matches_flax(self):
        import flax.linen as nn

        from vfmseg_tpu.ops.norm import LayerNorm

        x = _rand(63, (3, 50, 64))

        def loss_custom(x):
            mod = LayerNorm(epsilon=1e-6)
            v = mod.init(jax.random.PRNGKey(0), x)
            return jnp.sum(mod.apply(v, x) ** 2)

        def loss_flax(x):
            mod = nn.LayerNorm(epsilon=1e-6)
            v = mod.init(jax.random.PRNGKey(0), x)
            return jnp.sum(mod.apply(v, x) ** 2)

        g1 = jax.grad(loss_custom)(x)
        g2 = jax.grad(loss_flax)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)


class TestFlashQKVDirect:
    def test_qkv_direct_matches_xla_interpret(self):
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_qkv

        b, n, h, d = 2, 77, 4, 16
        qkv = _rand(70, (b, n, 3 * h * d))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qkv(qkv, h)
        qkv_r = qkv.reshape(b, n, 3, h, d)
        ref = xla_attention(qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2])
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref.transpose(0, 2, 1, 3)),
                                   rtol=2e-4, atol=2e-4)

    def test_qkv_direct_grad_matches_xla(self):
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_qkv

        b, n, h, d = 1, 53, 2, 16
        qkv = _rand(71, (b, n, 3 * h * d))

        def f_flash(qkv):
            return jnp.sum(flash_attention_qkv(qkv, h) ** 2)

        def f_xla(qkv):
            qkv_r = qkv.reshape(b, n, 3, h, d)
            out = xla_attention(qkv_r[:, :, 0], qkv_r[:, :, 1],
                                qkv_r[:, :, 2])
            return jnp.sum(out ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(f_flash)(qkv)
        g2 = jax.grad(f_xla)(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-4)

    def test_qkv_tav_batch_packing(self):
        """The TAV primal packs several batch items into one grid cell
        (default VFMSEG_FLASH_PACK=4, falling back to the largest divisor
        of b). Verify packed cells (b=4 -> one cell per head pair) and the
        divisor fallback (b=6 -> pack 3) both match XLA."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_qkv_tm

        h, d = 2, 16
        for b in (4, 6):
            n = 37
            qkv = _rand(80 + b, (b, n, 3 * h * d))
            with pltpu.force_tpu_interpret_mode():
                out = flash_attention_qkv_tm(qkv, h)
            qkv_r = qkv.reshape(b, n, 3, h, d)
            ref = xla_attention(qkv_r[:, :, 0], qkv_r[:, :, 1],
                                qkv_r[:, :, 2])
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
                rtol=2e-4, atol=2e-4)

    def test_qkv_tm_aligned_tail_side_chain(self):
        """In-kernel aligned-tail mode (auto at n=129: single tail token,
        large lane-padding fraction): the main chains cover 128 queries and
        the cls-like tail query rides the VPU side-chain — must match XLA
        for every row INCLUDING the tail (VERDICT r3 item 1b; the XLA-
        einsum split this replaces crashed the TPU worker at b=26)."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_qkv_tm

        b, n, h, d = 2, 129, 2, 16
        qkv = _rand(90, (b, n, 3 * h * d))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qkv_tm(qkv, h)
        qkv_r = qkv.reshape(b, n, 3, h, d)
        ref = xla_attention(qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
            rtol=2e-4, atol=2e-4)

    def test_qkv_primal_no_max_large_logits(self):
        """The inference primal drops the softmax running max (flash kernel
        no_max path) — verify it stays finite and XLA-exact at attention
        logit magnitudes well past anything a trained ViT produces
        (|logit| ~ 60 natural; DINOv2-L peaks around 30-50)."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_qkv_tm

        b, n, h, d = 1, 130, 2, 16
        qkv = _rand(72, (b, n, 3 * h * d))
        # scale q/k so logits reach ~±60: |q.k| ~ sqrt(d)*s^2 = 60
        s = (60.0 / (d ** 0.5)) ** 0.5
        qkv = qkv.at[..., : 2 * h * d].mul(s)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qkv_tm(qkv, h)
        assert bool(jnp.all(jnp.isfinite(out)))
        qkv_r = qkv.reshape(b, n, 3, h, d)
        ref = xla_attention(qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2])
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref.reshape(b, n, h * d)),
                                   rtol=2e-4, atol=2e-4)


class TestInKernelRope:
    """EVA02 in-kernel RoPE on the fused TAV primal (ops/rope.py evens|odds
    permuted convention + flash_attention rope=True)."""

    def test_permuted_convention_matches_rotate_half(self):
        """Scores from permuted-layout rotation == scores from the pairwise
        rotate_half convention (the joint q/k column permutation leaves the
        dot product invariant)."""
        from vfmseg_tpu.ops.rope import (
            apply_rope, apply_rope_permuted, evens_odds_perm,
            permuted_rope_tables, rope_2d_tables)

        h, d, n = 2, 16, 17
        cos, sin = rope_2d_tables(4, 4, d)
        cos = np.concatenate([np.ones((1, d), np.float32), cos])
        sin = np.concatenate([np.zeros((1, d), np.float32), sin])
        q = np.asarray(_rand(1, (1, n, h, d)))
        k = np.asarray(_rand(2, (1, n, h, d)))
        # reference: pairwise rotation per head
        qr = np.asarray(apply_rope(jnp.asarray(q), cos[None, :, None, :],
                                   sin[None, :, None, :]))
        kr = np.asarray(apply_rope(jnp.asarray(k), cos[None, :, None, :],
                                   sin[None, :, None, :]))
        scores_ref = np.einsum("bnhd,bmhd->bhnm", qr, kr)
        # permuted: reorder each head's dims to [evens|odds] (as the fused
        # path permutes the projection columns) and rotate via half-swap
        pc = evens_odds_perm(1, d)  # within-head permutation
        qp, kp = q[..., pc], k[..., pc]
        cosP, sinP = permuted_rope_tables(cos, sin)
        qpr = np.asarray(apply_rope_permuted(
            jnp.asarray(qp), cosP[None, :, None, :], sinP[None, :, None, :]))
        kpr = np.asarray(apply_rope_permuted(
            jnp.asarray(kp), cosP[None, :, None, :], sinP[None, :, None, :]))
        scores_perm = np.einsum("bnhd,bmhd->bhnm", qpr, kpr)
        np.testing.assert_allclose(scores_perm, scores_ref, atol=1e-5)

    def test_qkv_tav_rope_kernel_interpret(self):
        """The rope=True TAV kernel == the XLA fused-rope fallback (which
        the convention test above pins to the rotate_half reference)."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.attention import xla_attention
        from vfmseg_tpu.ops.flash_attention import flash_attention_qkv_tm
        from vfmseg_tpu.ops.rope import (
            apply_rope_permuted, permuted_rope_tables, rope_2d_tables)

        b, n, h, d = 2, 130, 2, 16
        cos, sin = rope_2d_tables(43, 3, d)  # 129 patch rows
        cos = jnp.concatenate([jnp.ones((1, d)), jnp.asarray(cos)])
        sin = jnp.concatenate([jnp.zeros((1, d)), jnp.asarray(sin)])
        cosP, sinP = permuted_rope_tables(cos, sin)
        qkv = _rand(91, (b, n, 3 * h * d))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qkv_tm(qkv, h, rope_cs=(cosP, sinP))
        qkv_r = qkv.reshape(b, n, 3, h, d)
        qr = apply_rope_permuted(qkv_r[:, :, 0], cosP[None, :, None, :],
                                 sinP[None, :, None, :])
        kr = apply_rope_permuted(qkv_r[:, :, 1], cosP[None, :, None, :],
                                 sinP[None, :, None, :])
        ref = xla_attention(qr, kr, qkv_r[:, :, 2])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
            rtol=2e-4, atol=2e-4)

    def test_qkv_tav_rope_aligned_tail_interpret(self):
        """rope + the in-kernel aligned-tail side-chain (n=129: 128 main
        queries + 1 tail) — the tail query must be rotated too."""
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.attention import xla_attention
        from vfmseg_tpu.ops.flash_attention import _flash_forward_qkv_tav_main
        from vfmseg_tpu.ops.rope import (
            apply_rope_permuted, permuted_rope_tables, rope_2d_tables)

        b, n, h, d = 1, 129, 2, 16
        cos, sin = rope_2d_tables(16, 8, d)
        cos = jnp.concatenate([jnp.ones((1, d)), jnp.asarray(cos)])
        sin = jnp.concatenate([jnp.zeros((1, d)), jnp.asarray(sin)])
        cosP, sinP = permuted_rope_tables(cos, sin)
        qkv = _rand(92, (b, n, 3 * h * d))
        with pltpu.force_tpu_interpret_mode():
            out_t = _flash_forward_qkv_tav_main(
                qkv, h, d ** -0.5, n - 1, tail=1, rope_cs=(cosP, sinP))
        out = out_t.transpose(0, 4, 1, 2, 3).reshape(b, n, h * d)
        qkv_r = qkv.reshape(b, n, 3, h, d)
        qr = apply_rope_permuted(qkv_r[:, :, 0], cosP[None, :, None, :],
                                 sinP[None, :, None, :])
        kr = apply_rope_permuted(qkv_r[:, :, 1], cosP[None, :, None, :],
                                 sinP[None, :, None, :])
        ref = xla_attention(qr, kr, qkv_r[:, :, 2])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
            rtol=2e-4, atol=2e-4)

    def test_eva02_fused_rope_branch_matches_headmajor(self, monkeypatch):
        """Tiny EVA02 backbone eval: the fused in-kernel-rope branch (XLA
        fallback on CPU) == the head-major rotate_half branch, same params
        (incl. a LoRA overlay exercising the raw-weight fold)."""
        import jax

        from vfmseg_tpu.models.backbones import LoRASpec
        from vfmseg_tpu.models.backbones.eva02 import build_eva02

        lora = LoRASpec(rank=4, alpha=4, dropout=0.0,
                        targets=("q_proj", "k_proj", "v_proj"))
        model = build_eva02(img_size=64, patch_size=16, embed_dim=64,
                            depth=2, num_heads=2, lora=lora,
                            out_indices=(0, 1))
        img = _rand(7, (1, 64, 64, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, img)
        monkeypatch.setenv("VFMSEG_EVA_FUSED_ROPE", "0")
        ref = model.apply(variables, img)
        monkeypatch.setenv("VFMSEG_EVA_FUSED_ROPE", "1")
        got = model.apply(variables, img)
        ref = ref[0] if isinstance(ref, tuple) else ref
        got = got[0] if isinstance(got, tuple) else got
        for r, g in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)


class TestQkvDirectBackward:
    """Token-major qkv-direct flash backward (no operand/grad transposes)
    vs the head-major backward route and XLA autodiff."""

    def _grads(self, qkv, h, monkeypatch, mode):
        from jax.experimental.pallas import tpu as pltpu

        from vfmseg_tpu.ops.flash_attention import flash_attention_qkv_tm

        monkeypatch.setenv("VFMSEG_FLASH_QKV_BWD", mode)

        def loss(z):
            return jnp.sum(flash_attention_qkv_tm(z, h).astype(jnp.float32)
                           ** 2)

        with pltpu.force_tpu_interpret_mode():
            return np.asarray(jax.grad(loss)(qkv))

    def test_direct_matches_hm_and_xla(self, monkeypatch):
        b, n, h, d = 2, 130, 2, 16
        qkv = _rand(95, (b, n, 3 * h * d))
        g_direct = self._grads(qkv, h, monkeypatch, "direct")
        g_hm = self._grads(qkv, h, monkeypatch, "hm")
        np.testing.assert_allclose(g_direct, g_hm, rtol=2e-4, atol=2e-4)

        def loss_xla(z):
            zr = z.reshape(b, n, 3, h, d)
            o = xla_attention(zr[:, :, 0], zr[:, :, 1], zr[:, :, 2])
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g_xla = np.asarray(jax.grad(loss_xla)(qkv))
        np.testing.assert_allclose(g_direct, g_xla, rtol=3e-3, atol=3e-3)

    def test_direct_matches_hm_multiblock(self, monkeypatch):
        # a length above the single-block limit exercises the blocked kv
        # loop and the padded q tail in the dkv kernel
        b, n, h, d = 1, 1100 + 60, 2, 16
        qkv = _rand(96, (b, n, 3 * h * d)) * 0.5
        g_direct = self._grads(qkv, h, monkeypatch, "direct")
        g_hm = self._grads(qkv, h, monkeypatch, "hm")
        np.testing.assert_allclose(g_direct, g_hm, rtol=3e-4, atol=3e-4)
