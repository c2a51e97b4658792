"""Model-layer tests: backbone shapes/adapters, heads, segmentor losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfmseg_tpu.models.backbones import (
    LoRASpec,
    ReinsSpec,
    dinov2_tiny_for_tests,
)
from vfmseg_tpu.models.heads import LinearHead, VFMHead
from vfmseg_tpu.models.losses import cross_entropy_loss, seg_accuracy
from vfmseg_tpu.models.segmentors import MsVFMSegmentor
from vfmseg_tpu.train import (
    make_optimizer,
    make_train_step,
    merge_params,
    partition_params,
    trainable_predicate,
    TrainState,
)

K = jax.random.PRNGKey


def _tiny_backbone(**kw):
    return dinov2_tiny_for_tests(**kw)


class TestBackbone:
    def test_feature_shapes(self):
        m = _tiny_backbone()
        x = jnp.zeros((2, 64, 64, 3))
        params = m.init(K(0), x)["params"]
        feats = m.apply({"params": params}, x)
        assert len(feats) == 4
        for f in feats:
            assert f.shape == (2, 4, 4, 32)

    def test_pos_embed_interpolation_nonsquare(self):
        m = _tiny_backbone(img_size=64)
        params = m.init(K(0), jnp.zeros((1, 64, 64, 3)))["params"]
        feats = m.apply({"params": params}, jnp.zeros((1, 64, 128, 3)))
        assert feats[0].shape == (1, 4, 8, 32)

    def test_lora_params_exist_and_affect_output(self):
        lora = LoRASpec(rank=4, alpha=4, targets=("qkv",))
        m = _tiny_backbone(lora=lora)
        x = jax.random.normal(K(1), (1, 64, 64, 3))
        params = m.init(K(0), x)["params"]
        flat = jax.tree_util.tree_leaves_with_path(params)
        lora_paths = [p for p, _ in flat if "lora" in str(p)]
        assert len(lora_paths) == 2 * 4  # a+b per block

        # lora_b starts at zero => output equals non-lora model with same base
        base = _tiny_backbone()
        base_params = base.init(K(0), x)["params"]
        out_lora = m.apply({"params": params}, x)
        out_base = base.apply({"params": base_params}, x)
        np.testing.assert_allclose(
            np.asarray(out_lora[-1]), np.asarray(out_base[-1]), atol=1e-5)

        # perturb lora_b -> output changes
        import flax.traverse_util as tu

        flatp = tu.flatten_dict(params, sep="/")
        for k in flatp:
            if k.endswith("lora_b"):
                flatp[k] = jnp.ones_like(flatp[k])
        params2 = tu.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flatp.items()})
        out2 = m.apply({"params": params2}, x)
        assert not np.allclose(np.asarray(out2[-1]), np.asarray(out_base[-1]))

    def test_reins_adapter_and_queries(self):
        reins = ReinsSpec(token_length=10, query_dims=16, lora_dim=4)
        m = _tiny_backbone(reins=reins)
        x = jnp.zeros((1, 64, 64, 3))
        params = m.init(K(0), x)["params"]
        feats, queries = m.apply({"params": params}, x)
        assert len(feats) == 4
        assert queries.shape == (10, 16)


class TestHeads:
    def test_linear_head(self):
        head = LinearHead(in_channels=(32,) * 4, channels=8, num_classes=5)
        feats = tuple(jnp.zeros((2, 4, 4, 32)) for _ in range(4))
        variables = head.init(K(0), feats)
        out = head.apply(variables, feats)
        assert out.shape == (2, 16, 16, 5)

    def test_linear_head_batchnorm_updates(self):
        head = LinearHead(in_channels=(32,) * 4, channels=8, num_classes=5)
        feats = tuple(jax.random.normal(K(i), (2, 4, 4, 32)) for i in range(4))
        variables = head.init(K(0), feats)
        out, new_state = head.apply(
            variables, feats, train=True, mutable=["batch_stats"],
            rngs={"dropout": K(9)})
        assert "batch_stats" in new_state
        assert out.shape == (2, 16, 16, 5)

    def test_vfm_head(self):
        head = VFMHead(
            transformer=dict(n_heads=2, d_head=8, depth=1, dropout=0.0,
                             mask_ratio=0.2, query_dim=16),
            in_channels=(32,) * 4, channels=16, num_classes=5,
        )
        feats = tuple(jnp.zeros((2, 4, 4, 32)) for _ in range(4))
        ctx = jnp.zeros((2, 8, 8, 5))
        variables = head.init(
            {"params": K(0), "mask": K(1)}, feats, ctx, train=True)
        out = head.apply(variables, feats, ctx, train=False, mask_enable=False)
        assert out.shape == (2, 4, 4, 5)

    def test_mask_token_changes_output_when_enabled(self):
        head = VFMHead(
            transformer=dict(n_heads=2, d_head=8, depth=1, dropout=0.0,
                             mask_ratio=0.9, query_dim=16),
            in_channels=(32,) * 4, channels=16, num_classes=5,
        )
        feats = tuple(jax.random.normal(K(i), (1, 4, 4, 32)) for i in range(4))
        ctx = jax.random.normal(K(7), (1, 8, 8, 5))
        variables = head.init({"params": K(0), "mask": K(1)}, feats, ctx, train=True)
        masked = head.apply(variables, feats, ctx, train=True, mask_enable=True,
                            rngs={"mask": K(3), "dropout": K(4)})
        unmasked = head.apply(variables, feats, ctx, train=False,
                              mask_enable=False)
        assert not np.allclose(np.asarray(masked), np.asarray(unmasked))


class TestLosses:
    def test_cross_entropy_matches_torch_semantics(self):
        torch = pytest.importorskip("torch")
        logits = np.random.RandomState(0).randn(2, 8, 8, 5).astype(np.float32)
        labels = np.random.RandomState(1).randint(0, 5, (2, 8, 8))
        labels[0, :2] = 255
        ours = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
        lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
        tt = torch.from_numpy(labels).long()
        # mmseg avg_non_ignore=False: sum of per-pixel CE (ignored -> 0) / numel
        per_pix = torch.nn.functional.cross_entropy(
            lt, tt, reduction="none", ignore_index=255)
        ref = per_pix.mean().item()
        np.testing.assert_allclose(float(ours), ref, rtol=1e-5)

    def test_accuracy_ignores(self):
        logits = jnp.zeros((1, 2, 2, 3)).at[..., 1].set(1.0)
        labels = jnp.array([[[1, 1], [0, 255]]])
        acc = seg_accuracy(logits, labels)
        np.testing.assert_allclose(float(acc), 100.0 * 2 / 3, rtol=1e-6)


def build_tiny_msvfm(dtype=jnp.float32):
    backbone = _tiny_backbone(img_size=64, dtype=dtype)
    decode_head = LinearHead(in_channels=(32,) * 4, channels=8, num_classes=5,
                             dtype=dtype)
    aux_head = VFMHead(
        transformer=dict(n_heads=2, d_head=8, depth=1, dropout=0.0,
                         mask_ratio=0.2, query_dim=16),
        in_channels=(32,) * 4, channels=16, num_classes=5, dtype=dtype,
    )
    return MsVFMSegmentor(
        backbone=backbone, decode_head=decode_head, aux_head=aux_head,
        hr_crop_size=(64, 64), crop_coord_divisible=32,
    )


class TestMsVFM:
    def test_training_losses(self):
        model = build_tiny_msvfm()
        img = jax.random.normal(K(0), (2, 128, 128, 3))
        labels = jax.random.randint(K(1), (2, 128, 128), 0, 5)
        variables = model.init(
            {"params": K(2), "crop": K(3), "mask": K(4), "dropout": K(5)},
            img, labels)
        losses, _ = model.apply(
            variables, img, labels, mutable=["batch_stats"],
            rngs={"crop": K(6), "mask": K(7), "dropout": K(8)})
        for k in ("decode_lr.loss_ce", "decode_lr.acc_seg",
                  "decode_hr.loss_ce", "decode_hr.acc_seg"):
            assert k in losses
            assert np.isfinite(float(losses[k]))

    def test_train_step_updates_only_trainable(self):
        model = build_tiny_msvfm()
        img = jax.random.normal(K(0), (2, 128, 128, 3))
        labels = jax.random.randint(K(1), (2, 128, 128), 0, 5)
        variables = model.init(
            {"params": K(2), "crop": K(3), "mask": K(4), "dropout": K(5)},
            img, labels)
        params = variables["params"]
        pred = trainable_predicate(peft=True)
        trainable, frozen = partition_params(params, pred)
        assert "backbone" in frozen and "decode_head" in trainable
        optimizer = make_optimizer(trainable, base_lr=1e-3, max_steps=100)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(trainable))
        step_fn = make_train_step(model, optimizer, donate=False)
        batch = {"img": img, "label": labels}
        new_state, metrics = step_fn(state, batch, K(9))
        assert np.isfinite(float(metrics["loss"]))
        # frozen stays identical, trainable changed
        for a, b in zip(jax.tree_util.tree_leaves(frozen),
                        jax.tree_util.tree_leaves(new_state.frozen)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(trainable),
                            jax.tree_util.tree_leaves(new_state.trainable)))
        assert changed

    def test_peft_partition_with_lora(self):
        lora = LoRASpec(rank=2, alpha=2, targets=("qkv",))
        backbone = _tiny_backbone(lora=lora)
        x = jnp.zeros((1, 64, 64, 3))
        params = backbone.init(K(0), x)["params"]
        params = {"backbone": params}
        trainable, frozen = partition_params(params, trainable_predicate())
        from flax.traverse_util import flatten_dict

        tkeys = {"/".join(k) for k in flatten_dict(trainable)}
        assert all("lora" in k for k in tkeys)
        assert len(tkeys) == 8  # 4 blocks x (lora_a, lora_b)
        merged = merge_params(trainable, frozen)
        assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)
