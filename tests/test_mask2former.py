"""Mask2Former stack tests: deformable sampling, pixel decoder, head,
Hungarian matching, set-prediction loss, full Rein+M2F train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfmseg_tpu.models.backbones.rein_backbones import build_reins_dinov2
from vfmseg_tpu.models.heads.m2f_loss import (
    hungarian_match,
    mask2former_loss,
    semantic_to_targets,
)
from vfmseg_tpu.models.heads.mask2former import (
    Mask2FormerHead,
    MSDeformAttnPixelDecoder,
    semantic_inference,
    sine_positional_encoding,
)
from vfmseg_tpu.models.segmentors.maskformer import MaskFormerSegmentor
from vfmseg_tpu.ops.deform_attn import bilinear_sample_nhwc

K = jax.random.PRNGKey


class TestDeformSampling:
    def test_bilinear_sample_centers(self):
        v = jnp.arange(12.0).reshape(1, 3, 4, 1)
        # sample exactly at pixel centers
        coords = jnp.array([[[(0.5) / 4, 0.5 / 3],
                             [(2 + 0.5) / 4, (1 + 0.5) / 3]]])
        out = bilinear_sample_nhwc(v, coords)
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), [0.0, 6.0])

    def test_bilinear_sample_out_of_range_zero(self):
        v = jnp.ones((1, 4, 4, 2))
        coords = jnp.array([[[-0.5, 0.5], [1.5, 0.5]]])
        out = bilinear_sample_nhwc(v, coords)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_sine_pos_encoding_shape(self):
        pos = sine_positional_encoding(4, 6, 16)
        assert pos.shape == (24, 32)
        assert np.isfinite(pos).all()


def _tiny_feats(b=1, c=32):
    shapes = [(16, 16), (8, 8), (4, 4), (2, 2)]
    return tuple(
        jax.random.normal(K(i), (b, h, w, c)) for i, (h, w) in enumerate(shapes))


class TestPixelDecoderAndHead:
    def test_pixel_decoder_shapes(self):
        dec = MSDeformAttnPixelDecoder(feat_channels=32, out_channels=32,
                                       num_encoder_layers=2)
        feats = _tiny_feats()
        variables = dec.init(K(0), feats)
        mask_feat, memories = dec.apply(variables, feats)
        assert mask_feat.shape == (1, 16, 16, 32)
        assert [m.shape[1] for m in memories] == [2, 4, 8]

    def test_head_forward_shapes(self):
        head = Mask2FormerHead(num_classes=5, num_queries=10, feat_channels=32,
                               num_decoder_layers=3, rein_queries=True,
                               replace_query_feat=True)
        feats = _tiny_feats()
        queries = jax.random.normal(K(9), (10, 32))
        variables = head.init(K(0), feats, queries)
        cls_preds, mask_preds = head.apply(variables, feats, queries,
                                           train=True)
        assert len(cls_preds) == 4  # initial + 3 layers
        assert cls_preds[0].shape == (1, 10, 6)
        assert mask_preds[0].shape == (1, 10, 16, 16)
        sem = semantic_inference(cls_preds[-1], mask_preds[-1], 5)
        assert sem.shape == (1, 16, 16, 5)

    def test_head_eval_matches_train_final_stage(self):
        """The eval path forms attention masks at level resolution via the
        resize/einsum commutation and returns only the final stage; its
        outputs must match the train path's final stage (identical weights,
        fp-rounding-level tolerance — only sigmoid~0.5 borderline attention
        pixels could differ, none at this seed)."""
        head = Mask2FormerHead(num_classes=5, num_queries=10, feat_channels=32,
                               num_decoder_layers=3, rein_queries=True,
                               replace_query_feat=True)
        feats = _tiny_feats()
        queries = jax.random.normal(K(9), (10, 32))
        variables = head.init(K(0), feats, queries)
        cls_tr, mask_tr = head.apply(variables, feats, queries, train=True)
        cls_ev, mask_ev = head.apply(variables, feats, queries, train=False)
        assert len(cls_ev) == 1 and len(mask_ev) == 1
        np.testing.assert_allclose(np.asarray(cls_ev[-1]),
                                   np.asarray(cls_tr[-1]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(mask_ev[-1]),
                                   np.asarray(mask_tr[-1]),
                                   rtol=1e-4, atol=1e-4)


class TestMatchingAndLoss:
    def test_semantic_to_targets(self):
        labels = jnp.array([[[0, 1], [255, 1]]])
        masks, exists = semantic_to_targets(labels, 3)
        assert masks.shape == (1, 3, 2, 2)
        np.testing.assert_array_equal(np.asarray(exists[0]), [True, True, False])
        assert masks[0, 1].sum() == 2

    def test_hungarian_correctness(self):
        # query i should match gt i when diagonal cost is lowest
        cost = jnp.full((1, 4, 3), 10.0)
        cost = cost.at[0, 1, 0].set(0.0).at[0, 2, 1].set(0.0).at[0, 3, 2].set(0.0)
        assign = hungarian_match(cost)
        np.testing.assert_array_equal(np.asarray(assign[0]), [1, 2, 3])

    def test_loss_prefers_correct_prediction(self):
        num_classes, nq, hw = 3, 5, 8
        labels = jnp.zeros((1, hw, hw), jnp.int32)
        labels = labels.at[:, 4:, :].set(1)  # two classes present
        gt_masks, _ = semantic_to_targets(labels, num_classes)

        good_cls = jnp.full((1, nq, num_classes + 1), -5.0)
        good_cls = good_cls.at[0, 0, 0].set(5.0).at[0, 1, 1].set(5.0)
        good_cls = good_cls.at[0, 2:, num_classes].set(5.0)
        good_mask = jnp.full((1, nq, hw, hw), -8.0)
        good_mask = good_mask.at[0, 0].set(gt_masks[0, 0] * 16 - 8)
        good_mask = good_mask.at[0, 1].set(gt_masks[0, 1] * 16 - 8)

        bad_cls = jnp.zeros_like(good_cls)
        bad_mask = jnp.zeros_like(good_mask)

        good = mask2former_loss([good_cls], [good_mask], labels, K(0),
                                num_classes=num_classes, num_points=64)
        bad = mask2former_loss([bad_cls], [bad_mask], labels, K(0),
                               num_classes=num_classes, num_points=64)
        assert float(good["loss_cls"]) < float(bad["loss_cls"])
        assert float(good["loss_dice"]) < float(bad["loss_dice"])
        # loss_mask concentrates on boundary points by design (uncertainty
        # sampling), so only total quality is comparable
        total_good = sum(float(v) for v in good.values())
        total_bad = sum(float(v) for v in bad.values())
        assert total_good < total_bad


class TestEndToEnd:
    def test_rein_m2f_train_step(self):
        from vfmseg_tpu.train import (
            TrainState, make_optimizer, make_train_step, partition_params,
            trainable_predicate,
        )

        backbone = build_reins_dinov2(
            dict(type="LoRAReins", token_length=10, lora_dim=4, query_dims=32),
            resize_feat=True, patch_size=16, embed_dim=32, depth=4,
            num_heads=2, img_size=64, out_indices=[0, 1, 2, 3],
            attn_impl="xla")
        head = Mask2FormerHead(num_classes=5, num_queries=10, feat_channels=32,
                               num_decoder_layers=3, rein_queries=True,
                               replace_query_feat=True)
        model = MaskFormerSegmentor(backbone=backbone, decode_head=head,
                                    num_classes=5, num_points=64)
        img = jax.random.normal(K(0), (2, 64, 64, 3))
        labels = jax.random.randint(K(1), (2, 64, 64), 0, 5)
        variables = model.init(
            {"params": K(2), "mask": K(3), "dropout": K(4)}, img, labels)
        losses = model.apply(variables, img, labels,
                             rngs={"mask": K(5), "dropout": K(6)})
        assert np.isfinite(float(losses["loss_cls"]))
        assert "d0.loss_dice" in losses

        params = variables["params"]
        trainable, frozen = partition_params(params, trainable_predicate())
        # reins + head train; ViT blocks frozen
        from flax.traverse_util import flatten_dict

        tkeys = {"/".join(k) for k in flatten_dict(trainable)}
        assert any("reins" in k for k in tkeys)
        assert any("decode_head" in k for k in tkeys)
        assert not any(k.startswith("backbone/blocks_0/attn/qkv/kernel")
                       for k in tkeys)

        optimizer = make_optimizer(trainable, base_lr=1e-3, max_steps=10)
        state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                           frozen=frozen, batch_stats={},
                           opt_state=optimizer.init(trainable))
        step_fn = make_train_step(model, optimizer, donate=False,
                                  rng_names=("mask", "dropout"))
        new_state, metrics = step_fn(state, {"img": img, "label": labels}, K(7))
        assert np.isfinite(float(metrics["loss"]))

        # inference path
        sem = model.apply(variables, img, method=MaskFormerSegmentor.encode_decode)
        assert sem.shape == (2, 64, 64, 5)
