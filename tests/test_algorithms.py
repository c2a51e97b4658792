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
