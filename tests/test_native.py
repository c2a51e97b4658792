"""Native data-loader parity tests (skipped when libvfmdata.so is absent)."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from vfmseg_tpu.data import native
from vfmseg_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    bilinear_resize_u8,
    nearest_resize_u8,
    normalize_pad,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native/libvfmdata.so not built")


@pytest.fixture
def tmp_png():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        Image.fromarray(img).save(f.name)
        yield f.name, img
    os.unlink(f.name)


def test_decode_matches_pil(tmp_png):
    path, ref = tmp_png
    out = native.load_image(path)
    np.testing.assert_array_equal(out, ref)
    assert native.image_size(path) == (53, 37)


def test_label_decode(tmp_png):
    rng = np.random.RandomState(1)
    lab = rng.randint(0, 19, (16, 24)).astype(np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        Image.fromarray(lab).save(f.name)
        out = native.load_label(f.name)
    os.unlink(f.name)
    np.testing.assert_array_equal(out, lab)


def test_decode_resize_matches_numpy_bilinear(tmp_png):
    path, ref = tmp_png
    out = native.load_image(path, size_wh=(26, 18))
    expect = bilinear_resize_u8(ref, (26, 18))
    diff = np.abs(out.astype(int) - expect.astype(int))
    assert diff.max() <= 1  # rounding may differ by one LSB


def test_label_resize_matches_numpy_nearest():
    rng = np.random.RandomState(2)
    lab = rng.randint(0, 19, (20, 30)).astype(np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        Image.fromarray(lab).save(f.name)
        out = native.load_label(f.name, size_wh=(15, 10))
    os.unlink(f.name)
    np.testing.assert_array_equal(out, nearest_resize_u8(lab, (15, 10)))


def test_normalize_pad_matches_numpy():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (10, 12, 3), np.uint8)
    out = native.normalize_pad(img, (16, 16), IMAGENET_MEAN, IMAGENET_STD)
    expect, _ = normalize_pad(img, None, (16, 16))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_jpeg_decode():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        Image.fromarray(img).save(f.name, quality=95)
        out = native.load_image(f.name)
        ref = np.asarray(Image.open(f.name).convert("RGB"))
    os.unlink(f.name)
    assert out.shape == (32, 32, 3)
    # lossy codec: decoders agree closely
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0
