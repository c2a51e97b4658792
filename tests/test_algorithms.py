"""DG masked-consistency and DACS UDA algorithm tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.models.algorithms.augment import (
    block_mask,
    class_mix_masks,
    color_jitter,
    gaussian_blur,
    one_mix,
    strong_transform,
)
from vfmseg_tpu.models.algorithms.dg import DomainGeneral
from vfmseg_tpu.models.backbones import dinov2_tiny_for_tests
from vfmseg_tpu.models.heads import LinearHead
from vfmseg_tpu.models.segmentors import EncoderDecoder
from vfmseg_tpu.train import (
    TrainState,
    make_optimizer,
    partition_params,
    trainable_predicate,
)
from vfmseg_tpu.train.uda import DACSConfig, make_dacs_train_step

K = jax.random.PRNGKey


class TestAugment:
    def test_color_jitter_bounds(self):
        img = jax.random.uniform(K(0), (1, 8, 8, 3))
        out = color_jitter(K(1), img, 0.5)
        assert out.shape == img.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_gaussian_blur_preserves_mean(self):
        img = jax.random.uniform(K(2), (1, 32, 32, 3))
        out = gaussian_blur(K(3), img)
        assert out.shape == img.shape
        # interior mean approx preserved (edge effects excluded)
        np.testing.assert_allclose(
            float(jnp.mean(out[:, 8:-8, 8:-8])),
            float(jnp.mean(img[:, 8:-8, 8:-8])), atol=0.05)

    def test_class_mix_masks_select_classes(self):
        labels = jnp.array([[[0, 1], [2, 255]]])
        mask = class_mix_masks(K(4), labels, num_classes=3)
        assert mask.shape == (1, 2, 2)
        # mask values constant per class region
        assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}
        # ignore pixels are never selected
        assert float(mask[0, 1, 1]) == 0.0

    def test_class_mix_masks_exact_half_subset(self):
        """Exactly ceil(n/2) of the present classes are picked
        (dacs_transforms.py:96-126 randperm semantics)."""
        rng = np.random.default_rng(0)
        for trial in range(20):
            present = rng.choice(19, size=rng.integers(1, 10), replace=False)
            # one pixel per present class, pad with ignore
            flat = np.full(32 * 32, 255, np.int64)
            flat[:len(present)] = present
            # scatter a few more pixels of each class
            for i, c in enumerate(present):
                flat[len(present) + i * 3:(len(present) + i * 3) + 3] = c
            labels = jnp.asarray(flat.reshape(1, 32, 32))
            mask = np.asarray(class_mix_masks(K(trial), labels))
            picked = {
                int(c) for c in present
                if mask[0][np.asarray(labels[0]) == c].max() == 1.0
            }
            n = len(present)
            assert len(picked) == (n + 1) // 2, (present, picked)

    def test_one_mix(self):
        m = jnp.array([[[1.0, 0.0]]])
        a = jnp.full((1, 1, 2, 3), 5.0)
        b = jnp.zeros((1, 1, 2, 3))
        out = one_mix(m, a, b)
        np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), [5.0, 0.0])

    def test_block_mask_zeroes_blocks(self):
        img = jnp.ones((2, 64, 64, 3))
        out = block_mask(K(5), img, mask_ratio=0.7, block_size=16)
        vals = set(np.unique(np.asarray(out)))
        assert vals <= {0.0, 1.0}
        assert 0.0 in vals  # something was masked at ratio 0.7

    def test_strong_transform_shapes(self):
        img = jax.random.normal(K(6), (1, 32, 32, 3))
        mean = jnp.asarray((123.675, 116.28, 103.53))
        std = jnp.asarray((58.395, 57.12, 57.375))
        out = strong_transform(K(7), img, mean, std)
        assert out.shape == img.shape
        assert np.isfinite(np.asarray(out)).all()


def _tiny_enc_dec():
    return EncoderDecoder(
        backbone=dinov2_tiny_for_tests(img_size=64),
        decode_head=LinearHead(in_channels=(32,) * 4, channels=8, num_classes=5))


class TestDomainGeneral:
    def test_mask_loss_branch(self):
        model = DomainGeneral(model=_tiny_enc_dec(), enable_mask_loss=True)
        img = jax.random.normal(K(0), (2, 64, 64, 3))
        labels = jax.random.randint(K(1), (2, 64, 64), 0, 5)
        variables = model.init(
            {"params": K(2), "augment": K(3), "dropout": K(4)}, img, labels)
        losses, _ = model.apply(
            variables, img, labels, mutable=["batch_stats"],
            rngs={"augment": K(5), "dropout": K(6)})
        assert "decode.loss_ce" in losses
        assert "mask.decode.loss_ce" in losses
        assert np.isfinite(float(losses["mask.decode.loss_ce"]))


class TestDGInference:
    """DomainGeneral-wrapped models must be evaluable end-to-end (reference
    Wrapper.py:24-45 delegates predict to the inner model)."""

    def _wrapped_msvfm(self):
        from test_models import build_tiny_msvfm

        model = DomainGeneral(model=build_tiny_msvfm(), enable_mask_loss=True,
                              mask_block_size=16)
        img = jax.random.normal(K(0), (1, 128, 128, 3))
        labels = jax.random.randint(K(1), (1, 128, 128), 0, 5)
        variables = model.init(
            {"params": K(2), "crop": K(3), "mask": K(4), "dropout": K(5),
             "augment": K(6)}, img, labels)
        return model, variables

    def test_ms_slide_predict_on_wrapper(self):
        from vfmseg_tpu.eval.evaluator import make_predict_fn

        model, variables = self._wrapped_msvfm()
        test_cfg = dict(mode="ms_slide_inference", threshold=0.968, conf=0.8,
                        lr_img_size=(64, 64), stride=(32, 32),
                        crop_size=(64, 64))
        predict = make_predict_fn(model, test_cfg, out_hw=(128, 128))
        img = jax.random.normal(K(7), (1, 128, 128, 3))
        pred = predict(variables, img)
        assert pred.shape == (1, 128, 128)
        assert int(pred.max()) < 5

    def test_wrapper_matches_inner_model_prediction(self):
        from vfmseg_tpu.eval.evaluator import make_predict_fn, unwrap_model

        model, variables = self._wrapped_msvfm()
        inner, rescope = unwrap_model(model)
        test_cfg = dict(mode="ms_slide_inference", threshold=0.968, conf=0.8,
                        lr_img_size=(64, 64), stride=(32, 32),
                        crop_size=(64, 64))
        img = jax.random.normal(K(8), (1, 128, 128, 3))
        wrapped = make_predict_fn(model, test_cfg, out_hw=(128, 128))(
            variables, img)
        direct = make_predict_fn(inner, test_cfg, out_hw=(128, 128))(
            rescope(variables), img)
        np.testing.assert_array_equal(np.asarray(wrapped), np.asarray(direct))

    def test_compact_gate_predict_on_wrapper(self):
        from vfmseg_tpu.eval.evaluator import make_predict_fn

        model, variables = self._wrapped_msvfm()
        test_cfg = dict(mode="ms_slide_inference", gate="compact",
                        threshold=0.968, conf=0.8, lr_img_size=(64, 64),
                        stride=(32, 32), crop_size=(64, 64))
        predict = make_predict_fn(model, test_cfg, out_hw=(128, 128))
        pred = predict(variables, jax.random.normal(K(9), (1, 128, 128, 3)))
        assert pred.shape == (1, 128, 128)

    def test_trainable_partition_under_wrapper(self):
        """The ViT must stay frozen when nested under model/ (peft surgery
        applies to the inner backbone, reference lora_backbone.py:37-41)."""
        model, variables = self._wrapped_msvfm()
        pred = trainable_predicate(peft=True)
        trainable, frozen = partition_params(variables["params"], pred)
        from flax.traverse_util import flatten_dict

        frozen_paths = {"/".join(k) for k in flatten_dict(frozen)}
        trainable_paths = {"/".join(k) for k in flatten_dict(trainable)}
        assert any(p.startswith("model/backbone/") for p in frozen_paths)
        assert not any("/backbone/" in p and "lora" not in p
                       for p in trainable_paths)
        assert any(p.startswith("model/decode_head/") for p in trainable_paths)

    def test_resolve_backbone_prefix_and_merge(self):
        from vfmseg_tpu.train.optim import (
            merge_params, nest_under, resolve_backbone_prefix)

        model, variables = self._wrapped_msvfm()
        params = variables["params"]
        prefix = resolve_backbone_prefix(params)
        assert prefix == ("model", "backbone")
        bb = params["model"]["backbone"]
        marked = jax.tree_util.tree_map(lambda x: x + 1.0, bb)
        merged = merge_params(nest_under(prefix, marked), params)
        lhs = jax.tree_util.tree_leaves(merged["model"]["backbone"])
        rhs = jax.tree_util.tree_leaves(marked)
        assert all(np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(lhs, rhs))


def test_reins_clip_fpn_is_trainable():
    """reference reins_clip.py:87-90 trains ["fpn", "reins"]; the default
    adapter keywords must cover the FPN pyramid."""
    from vfmseg_tpu.core.registry import MODELS

    backbone = MODELS.build(dict(
        type="ReinsCLIPVisionTransformer",
        reins_config=dict(type="LoRAReins", token_length=10, query_dims=16,
                          lora_dim=4),
        patch_size=16, width=32, layers=4, heads=2, input_resolution=64,
        output_dim=32, out_indices=[0, 1, 2, 3]))
    img = jnp.zeros((1, 64, 64, 3))
    variables = backbone.init({"params": K(0)}, img)
    trainable, frozen = partition_params(
        {"backbone": variables["params"]}, trainable_predicate(peft=True))
    from flax.traverse_util import flatten_dict

    t_paths = {"/".join(k) for k in flatten_dict(trainable)}
    assert any("/fpn/" in p for p in t_paths), sorted(t_paths)[:5]


class TestDACS:
    def test_dacs_step_updates_ema(self):
        model = _tiny_enc_dec()
        img = jax.random.normal(K(0), (2, 64, 64, 3))
        labels = jax.random.randint(K(1), (2, 64, 64), 0, 5)
        tgt = jax.random.normal(K(2), (2, 64, 64, 3))
        variables = model.init({"params": K(3), "dropout": K(4)}, img, labels)
        params = variables["params"]
        trainable, frozen = partition_params(params, trainable_predicate())
        optimizer = make_optimizer(trainable, base_lr=1e-3, max_steps=10)
        ema = jax.tree_util.tree_map(
            lambda x: x, dict(params)["decode_head"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(trainable), ema=ema)
        step_fn = make_dacs_train_step(
            model, optimizer, DACSConfig(num_classes=5), donate=False)
        batch = {"img": img, "label": labels, "target_img": tgt}
        new_state, metrics = step_fn(state, batch, K(9))
        assert np.isfinite(float(metrics["loss"]))
        assert "src.decode.loss_ce" in metrics
        assert "mix.decode.loss_ce" in metrics
        assert 0.0 <= float(metrics["pseudo_weight"]) <= 1.0
        # ema changed (alpha=0 at step 0 -> ema = student head)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state.ema),
                            jax.tree_util.tree_leaves(new_state.ema)))
        assert changed

        # second step exercises nonzero alpha
        new_state2, _ = step_fn(new_state, batch, K(10))
        assert int(new_state2.step) == 2
