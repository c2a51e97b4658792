"""HRDA / SegFormer / DAFormer / Attention / DINO heads + segmentor variants."""

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.models.backbones import dinov2_tiny_for_tests
from vfmseg_tpu.models.build import build_segmentor
from vfmseg_tpu.models.heads.attention_head import AttentionHead
from vfmseg_tpu.models.heads.daformer import DAFormerHead
from vfmseg_tpu.models.heads.dino_head import DINOHead
from vfmseg_tpu.models.heads.segformer import SegformerHead

K = jax.random.PRNGKey


def _feats(b=2, c=32, hw=4):
    return tuple(jax.random.normal(K(i), (b, hw, hw, c)) for i in range(4))


class TestSimpleHeads:
    def test_attention_head(self):
        head = AttentionHead(in_channels=(32,) * 4, channels=16, num_classes=5)
        v = head.init(K(0), _feats())
        out = head.apply(v, _feats())
        assert out.shape == (2, 4, 4, 5)

    def test_segformer_head(self):
        head = SegformerHead(in_channels=(32,) * 4, channels=16, num_classes=5)
        v = head.init(K(0), _feats())
        out = head.apply(v, _feats())
        assert out.shape == (2, 4, 4, 5)

    def test_daformer_head_multiscale_inputs(self):
        head = DAFormerHead(in_channels=(32,) * 4, channels=16, num_classes=5)
        feats = tuple(
            jax.random.normal(K(i), (1, s, s, 32)) for i, s in enumerate([8, 4, 2, 1]))
        v = head.init(K(0), feats)
        out = head.apply(v, feats)
        assert out.shape == (1, 8, 8, 5)

    def test_dino_head_with_context(self):
        head = DINOHead(in_channels=(32,) * 4, channels=16, num_classes=5,
                        n_heads=2, d_head=8, attn_impl="xla")
        feats = _feats(b=1)
        ctx = jax.random.normal(K(8), (1, 8, 8, 5))
        v = head.init(K(0), feats, ctx)
        out = head.apply(v, feats, ctx)
        out_nc = head.apply(v, feats, None)
        assert out.shape == (1, 4, 4, 5)
        assert not np.allclose(np.asarray(out), np.asarray(out_nc))


def _hrda_cfg():
    return dict(
        type="HRDAEncoderDecoder",
        backbone=dict(type="DinoVisionTransformer", patch_size=16,
                      embed_dim=32, depth=4, num_heads=2, img_size=64,
                      out_indices=[0, 1, 2, 3]),
        decode_head=dict(
            type="HRDAHead",
            seg_head=dict(type="LinearHead", in_channels=[32] * 4, channels=8,
                          num_classes=5),
            single_scale_head=dict(type="AttentionHead", in_channels=[32] * 4,
                                   channels=16, num_classes=5),
            hr_loss_weight=0.1,
        ),
        scales=[1, 0.5],
        hr_crop_size=(64, 64),
        crop_coord_divisible=8,
    )


class TestHRDA:
    def test_train_losses(self):
        model = build_segmentor(_hrda_cfg(), attn_impl="xla")
        img = jax.random.normal(K(0), (2, 128, 128, 3))
        labels = jax.random.randint(K(1), (2, 128, 128), 0, 5)
        variables = model.init(
            {"params": K(2), "crop": K(3), "dropout": K(4)}, img, labels)
        losses, _ = model.apply(
            variables, img, labels, mutable=["batch_stats"],
            rngs={"crop": K(5), "dropout": K(6)})
        for k in ("loss_seg", "acc_seg", "hr.loss_seg"):
            assert k in losses and np.isfinite(float(losses[k]))

    def test_encode_decode(self):
        model = build_segmentor(_hrda_cfg(), attn_impl="xla")
        img = jax.random.normal(K(0), (1, 128, 128, 3))
        labels = jnp.zeros((1, 128, 128), jnp.int32)
        variables = model.init(
            {"params": K(2), "crop": K(3), "dropout": K(4)}, img, labels)
        out = model.apply(variables, img,
                          method=type(model).encode_decode)
        assert out.shape == (1, 128, 128, 5)

    def test_frozen_hrda_builds(self):
        cfg = _hrda_cfg() | {"type": "FrozenHRDAEncoderDecoder"}
        model = build_segmentor(cfg, attn_impl="xla")
        assert model.frozen_backbone


class TestSegmentorVariants:
    def test_multiscale_encoder_decoder(self):
        cfg = dict(
            type="MultiScaleEncoderDecoder",
            backbone=dict(type="DinoVisionTransformer", patch_size=16,
                          embed_dim=32, depth=4, num_heads=2, img_size=64,
                          out_indices=[0, 1, 2, 3]),
            decode_head=dict(type="DINOhead", in_channels=[32] * 4,
                             channels=16, num_classes=5),
            hr_crop_size=(64, 64), crop_coord_divisible=32,
        )
        model = build_segmentor(cfg, attn_impl="xla")
        img = jax.random.normal(K(0), (1, 128, 128, 3))
        labels = jax.random.randint(K(1), (1, 128, 128), 0, 5)
        variables = model.init(
            {"params": K(2), "crop": K(3), "dropout": K(4)}, img, labels)
        losses = model.apply(variables, img, labels,
                             rngs={"crop": K(5), "dropout": K(6)})
        assert "decode_hr.loss_ce" in losses

    def test_frozen_encoder_decoder(self):
        cfg = dict(
            type="FrozenBackboneEncoderDecoder",
            backbone=dict(type="DinoVisionTransformer", patch_size=16,
                          embed_dim=32, depth=4, num_heads=2, img_size=64,
                          out_indices=[0, 1, 2, 3]),
            decode_head=dict(type="LinearHead", in_channels=[32] * 4,
                             channels=8, num_classes=5),
        )
        model = build_segmentor(cfg, attn_impl="xla")
        assert model.frozen_backbone
        img = jax.random.normal(K(0), (1, 64, 64, 3))
        labels = jax.random.randint(K(1), (1, 64, 64), 0, 5)
        variables = model.init(
            {"params": K(2), "dropout": K(3)}, img, labels)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                img, labels, mutable=["batch_stats"],
                rngs={"dropout": K(4)})
            return sum(v for k, v in out.items() if "loss" in k)

        grads = jax.grad(loss_fn)(variables["params"])
        bb_norm = sum(
            float(jnp.sum(jnp.abs(g)))
            for g in jax.tree_util.tree_leaves(grads["backbone"]))
        assert bb_norm == 0.0  # stop_gradient keeps the backbone grad-free

    def test_lora_encoder_decoder(self):
        cfg = dict(
            type="LoraBackboneEncoderDecoder",
            backbone=dict(type="DinoVisionTransformer", patch_size=16,
                          embed_dim=32, depth=4, num_heads=2, img_size=64,
                          out_indices=[0, 1, 2, 3]),
            Lora_config=dict(r=4, lora_alpha=4, target_modules=["qkv"]),
            decode_head=dict(type="LinearHead", in_channels=[32] * 4,
                             channels=8, num_classes=5),
        )
        model = build_segmentor(cfg, attn_impl="xla")
        img = jnp.zeros((1, 64, 64, 3))
        labels = jnp.zeros((1, 64, 64), jnp.int32)
        variables = model.init({"params": K(0), "dropout": K(1)}, img, labels)
        from flax.traverse_util import flatten_dict

        paths = {"/".join(k) for k in flatten_dict(variables["params"])}
        assert any("lora_a" in p for p in paths)
