"""Host-pipeline transform tests.

Covers the RandomChoiceResize/ResizeShortestEdge scale jitter
(reference configs/rein_dinov2_mask2former_512x512_bs1x4.py:8-21 and
configs/_base_/datasets/gta_512x512.py:8-14) and its TrainPipeline wiring:
distribution over the 16 reference scales, shortest-edge/max-size
semantics, and the static output shape contract after crop+pad.
"""

import numpy as np

from vfmseg_tpu.data.transforms import (
    TrainPipeline,
    random_choice_resize_shortest_edge,
)

REF_SCALES = [int(512 * x * 0.1) for x in range(5, 21)]  # 256..1024, 16


def test_reference_scale_table():
    assert len(REF_SCALES) == 16
    assert REF_SCALES[0] == 256 and REF_SCALES[-1] == 1024
    assert REF_SCALES == sorted(set(REF_SCALES))


def test_shortest_edge_semantics():
    rng = np.random.default_rng(0)
    img = np.zeros((1052, 1914, 3), np.uint8)  # GTA frame geometry
    lbl = np.zeros((1052, 1914), np.uint8)
    for _ in range(40):
        out_img, out_lbl, s = random_choice_resize_shortest_edge(
            img, lbl, REF_SCALES, 2048, rng)
        h, w = out_img.shape[:2]
        assert out_lbl.shape == (h, w)
        ratio = min(s / 1052, 2048 / 1914)
        assert (w, h) == (int(1914 * ratio + 0.5), int(1052 * ratio + 0.5))
        # aspect preserved to rounding
        assert abs(w / h - 1914 / 1052) < 0.01
        # long edge never exceeds max_size
        assert max(h, w) <= 2048


def test_max_size_clamps_long_edge():
    rng = np.random.default_rng(1)
    img = np.zeros((512, 4096, 3), np.uint8)  # extreme panorama
    for _ in range(20):
        out, _, s = random_choice_resize_shortest_edge(
            img, None, REF_SCALES, 2048, rng)
        h, w = out.shape[:2]
        assert w <= 2048
        if s > 256:  # 4096/512 = 8:1 — the long edge clamps first
            assert w == 2048


def test_scale_distribution_uniform():
    rng = np.random.default_rng(2)
    img = np.zeros((64, 96, 3), np.uint8)
    n = 1600
    counts = {}
    for _ in range(n):
        _, _, s = random_choice_resize_shortest_edge(
            img, None, REF_SCALES, 2048, rng)
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == set(REF_SCALES)
    expect = n / len(REF_SCALES)  # 100 per scale
    for s, c in counts.items():
        assert abs(c - expect) < 5 * np.sqrt(expect), (s, c)


def test_train_pipeline_jitter_static_output_shape():
    """Jitter makes intermediate shapes dynamic; RandomCrop + pad-to-crop
    must restore the static (512, 512) batch contract for every drawn
    scale, including ones where the resized image is SMALLER than the
    crop (scale 256 < 512)."""
    pipe = TrainPipeline(
        resize_scale_wh=(1280, 720), crop_size=(512, 512),
        cat_max_ratio=0.75, flip_prob=0.5, photometric=False,
        scale_jitter_scales=REF_SCALES, scale_jitter_max_size=2048)
    rng = np.random.default_rng(3)
    img = (np.arange(720 * 1280 * 3) % 255).astype(np.uint8).reshape(
        720, 1280, 3)
    lbl = (np.arange(720 * 1280) % 19).astype(np.uint8).reshape(720, 1280)
    seen_small = False
    for _ in range(24):
        out = pipe(img, lbl, rng)
        assert out["img"].shape == (512, 512, 3)
        assert out["label"].shape == (512, 512)
        # padded label regions carry ignore (255)
        if (out["label"] == 255).any():
            seen_small = True
    assert seen_small, "expected at least one below-crop scale draw in 24"


def test_train_pipeline_fixed_resize_unchanged_without_jitter():
    pipe = TrainPipeline(resize_scale_wh=(256, 128), crop_size=(128, 128),
                         cat_max_ratio=1.0, flip_prob=0.0, photometric=False)
    rng = np.random.default_rng(4)
    img = np.full((64, 128, 3), 7, np.uint8)
    lbl = np.zeros((64, 128), np.uint8)
    out = pipe(img, lbl, rng)
    assert out["img"].shape == (128, 128, 3)
