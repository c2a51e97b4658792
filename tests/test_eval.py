"""Sliding-window inference property tests + metric tests (SURVEY §4c)."""

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.eval.metrics import IoUAccumulator, intersect_and_union
from vfmseg_tpu.eval.slide import (
    accumulate_crops,
    compute_slide_grid,
    extract_crops,
    ms_slide_inference,
    slide_inference,
)

K = jax.random.PRNGKey


class TestSlide:
    def test_grid_covers_image(self):
        boxes = compute_slide_grid((1024, 2048), (512, 512), (320, 320))
        cover = np.zeros((1024, 2048), dtype=np.int32)
        for y1, x1 in boxes:
            cover[y1:y1 + 512, x1:x1 + 512] += 1
        assert (cover > 0).all()
        assert len(boxes) == 18  # 3 x 6 for cityscapes geometry

    def test_slide_equals_whole_for_linear_fn(self):
        """Overlap-averaging a linear (per-pixel) function == applying it whole."""
        img = jax.random.normal(K(0), (2, 96, 128, 3))

        def per_pixel_fn(crops):
            return crops @ jnp.ones((3, 4))

        out = slide_inference(per_pixel_fn, img, (64, 64), (32, 32))
        expect = per_pixel_fn(img)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)

    def test_extract_accumulate_roundtrip(self):
        img = jax.random.normal(K(1), (1, 64, 96, 5))
        boxes = compute_slide_grid((64, 96), (32, 32), (16, 16))
        crops = extract_crops(img, boxes, (32, 32))
        out = accumulate_crops(crops, boxes, (64, 96))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   rtol=1e-5, atol=1e-5)

    def test_ms_slide_gate_selects_context_when_confident(self):
        """With an extremely confident stage-1, no crop should be refined, so
        the result must equal overlap-averaged context (reference :451-452)."""
        img = jax.random.normal(K(2), (1, 64, 64, 3))

        def lr_fn(x):
            logits = jnp.zeros(x.shape[:3] + (4,))
            return logits.at[..., 2].set(100.0)  # max softmax ~1 everywhere

        def hr_fn(crops, ctx):
            return jnp.full(crops.shape[:3] + (4,), -7.0)  # sentinel

        out = ms_slide_inference(
            lr_fn, hr_fn, img, crop=(32, 32), stride=(16, 16),
            lr_size=(32, 32), threshold=0.968, conf=0.8)
        assert np.asarray(out)[..., 2].min() > 50.0  # context won everywhere

    def test_ms_slide_refines_when_unconfident(self):
        img = jax.random.normal(K(3), (1, 64, 64, 3))

        def lr_fn(x):
            return jnp.zeros(x.shape[:3] + (4,))  # uniform => low confidence

        def hr_fn(crops, ctx):
            return jnp.full(crops.shape[:3] + (4,), 5.0)

        out = ms_slide_inference(
            lr_fn, hr_fn, img, crop=(32, 32), stride=(16, 16),
            lr_size=(32, 32), threshold=0.968, conf=0.8)
        np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-6)


class TestMetrics:
    def test_intersect_union_simple(self):
        pred = jnp.array([[0, 1], [2, 2]])
        label = jnp.array([[0, 1], [2, 255]])
        inter, union, apred, alabel = intersect_and_union(pred, label, 3)
        np.testing.assert_array_equal(np.asarray(inter), [1, 1, 1])
        np.testing.assert_array_equal(np.asarray(union), [1, 1, 1])

    def test_miou_grouping(self):
        acc = IoUAccumulator(num_classes=2,
                             dataset_keys=["citys/", "bdd/"],
                             mean_used_keys=["citys/", "bdd/"])
        # citys: perfect prediction
        acc.update(jnp.array([[0, 1]]), jnp.array([[0, 1]]), "data/citys/img1.png")
        # bdd: half right on class 0
        acc.update(jnp.array([[0, 0]]), jnp.array([[0, 1]]), "data/bdd/img2.png")
        res = acc.compute()
        assert res["citys/_mIoU"] == 100.0
        # bdd: class0 iou=1/2, class1 iou=0 -> 25
        assert res["bdd/_mIoU"] == 25.0
        assert res["mean_mIoU"] == 62.5

    def test_matches_reference_formula_random(self):
        rng = np.random.RandomState(0)
        pred = rng.randint(0, 19, (33, 47))
        label = rng.randint(0, 19, (33, 47))
        label[0, :10] = 255
        inter, union, _, alabel = (
            np.asarray(x) for x in intersect_and_union(
                jnp.asarray(pred), jnp.asarray(label), 19))
        # naive per-class
        for c in range(19):
            valid = label != 255
            p = (pred == c) & valid
            l = (label == c) & valid
            assert inter[c] == (p & l).sum()
            assert union[c] == (p | l).sum()


class TestTTA:
    def test_flip_averaging_math(self):
        """tta = mean(softmax(f(x)), unflip(softmax(f(flip(x)))))."""
        import jax

        from vfmseg_tpu.eval.tta import tta_logits

        w = jax.random.normal(jax.random.PRNGKey(0), (3, 4))

        def logits_fn(x):
            # deliberately position-sensitive (not flip-equivariant)
            ramp = jnp.linspace(0.0, 1.0, x.shape[2])[None, None, :, None]
            return x @ w + ramp

        img = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
        got = tta_logits(logits_fn, img, flip=True, scales=(1.0,))

        p0 = jax.nn.softmax(logits_fn(img), axis=-1)
        p1 = jax.nn.softmax(logits_fn(img[:, :, ::-1]), axis=-1)[:, :, ::-1]
        expect = (p0 + p1) / 2.0
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-5, atol=1e-6)
        # probabilities: sums to one
        np.testing.assert_allclose(np.asarray(got.sum(-1)), 1.0, rtol=1e-5)

    def test_multiscale_shapes(self):
        from vfmseg_tpu.eval.tta import tta_logits

        w = jax.random.normal(jax.random.PRNGKey(2), (3, 5))
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
        got = tta_logits(lambda x: x @ w, img, flip=True, scales=(0.5, 1.0))
        assert got.shape == (2, 16, 16, 5)
        np.testing.assert_allclose(np.asarray(got.sum(-1)), 1.0, rtol=1e-5)


def test_accumulate_crops_gather_matches_scatter():
    """The band-decomposed gather formulation must reproduce the scatter
    version bit-for-bit (same fp32 add order) on a clamped, overlapping
    grid, including a non-grid fallback case."""
    import numpy as np

    from vfmseg_tpu.eval.slide import accumulate_crops, compute_slide_grid

    rng = np.random.RandomState(0)
    out_hw, crop, stride = (96, 160), (64, 64), (40, 40)
    boxes = compute_slide_grid(out_hw, crop, stride)
    b = 2
    crops = jnp.asarray(rng.randn(len(boxes) * b, 64, 64, 5).astype(np.float32))
    got = accumulate_crops(crops, boxes, out_hw)

    preds = np.zeros((b, *out_hw, 5), np.float32)
    count = np.zeros((b, *out_hw, 1), np.float32)
    for i, (y1, x1) in enumerate(boxes):
        preds[:, y1:y1 + 64, x1:x1 + 64] += np.asarray(crops[i * b:(i + 1) * b])
        count[:, y1:y1 + 64, x1:x1 + 64] += 1
    np.testing.assert_allclose(np.asarray(got), preds / count,
                               rtol=1e-6, atol=1e-6)

    # non-grid ordering exercises the scatter fallback
    got2 = accumulate_crops(
        jnp.concatenate([crops[b:], crops[:b]], axis=0),
        boxes[1:] + boxes[:1], out_hw)
    np.testing.assert_allclose(np.asarray(got2), preds / count,
                               rtol=1e-6, atol=1e-6)
