"""Device-side strong augmentations for DG/UDA (jit-compiled jax).

Rebuilds rein/models/utils/dacs_transforms.py and masking_transforms.py
TPU-natively (SURVEY §2.9: the reference leans on kornia CUDA ops — which
are in fact dead there, the kornia import is commented out):

  * one_mix / ClassMix (dacs_transforms.py:96-126)
  * color jitter (brightness/contrast/saturation/hue, kornia-style factors)
    applied in denormalized [0,1] space (:52-66)
  * gaussian blur with sigma ~ U(0.15, 1.15) and kernel ~ 0.1*H (:69-89)
  * BlockMaskGenerator: block-wise random masking (masking_transforms.py:20-40)

All functions take explicit PRNG keys and static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmseg_tpu.ops.resize import resize


def denorm(img: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return (img * std + mean) / 255.0


def renorm(img: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return (img * 255.0 - mean) / std


def _rgb_to_hsv(rgb: jax.Array):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q]),
    ], axis=-1)
    return rgb


def color_jitter(rng: jax.Array, img01: jax.Array, strength: float = 0.25
                 ) -> jax.Array:
    """Random brightness/contrast/saturation/hue, each factor ~ U(1-s, 1+s)
    (hue shift ~ U(-s, s)), on [0,1] NHWC images."""
    kb, kc, ks, kh = jax.random.split(rng, 4)
    b = jax.random.uniform(kb, (), minval=1 - strength, maxval=1 + strength)
    c = jax.random.uniform(kc, (), minval=1 - strength, maxval=1 + strength)
    s = jax.random.uniform(ks, (), minval=1 - strength, maxval=1 + strength)
    hshift = jax.random.uniform(kh, (), minval=-strength, maxval=strength)
    x = jnp.clip(img01 * b, 0.0, 1.0)
    mean_gray = jnp.mean(x, axis=(-1, -2, -3), keepdims=True)
    x = jnp.clip((x - mean_gray) * c + mean_gray, 0.0, 1.0)
    h, sat, v = _rgb_to_hsv(x)
    sat = jnp.clip(sat * s, 0.0, 1.0)
    h = (h + hshift) % 1.0
    return jnp.clip(_hsv_to_rgb(h, sat, v), 0.0, 1.0)


def gaussian_blur(rng: jax.Array, img: jax.Array) -> jax.Array:
    """Separable gaussian blur, sigma ~ U(0.15, 1.15), kernel ~ 0.1*size odd
    capped for efficiency (dacs_transforms.py:69-89)."""
    h, w = img.shape[1], img.shape[2]

    def ksize(n):
        k = int(np.floor(np.ceil(0.1 * n) - 0.5 + np.ceil(0.1 * n) % 2))
        return max(min(k, 23), 3) | 1

    ky, kx = ksize(h), ksize(w)
    sigma = jax.random.uniform(rng, (), minval=0.15, maxval=1.15)

    def kernel1d(k):
        r = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
        g = jnp.exp(-0.5 * (r / sigma) ** 2)
        return g / jnp.sum(g)

    gy = kernel1d(ky)
    gx = kernel1d(kx)
    c = img.shape[-1]
    x = jnp.moveaxis(img, -1, 1).reshape(-1, 1, h, w)
    x = jax.lax.conv_general_dilated(
        x, gy.reshape(1, 1, ky, 1), (1, 1), [(ky // 2, ky // 2), (0, 0)])
    x = jax.lax.conv_general_dilated(
        x, gx.reshape(1, 1, 1, kx), (1, 1), [(0, 0), (kx // 2, kx // 2)])
    return jnp.moveaxis(x.reshape(img.shape[0], c, h, w), 1, -1)


def strong_transform(rng: jax.Array, img: jax.Array, mean: jax.Array,
                     std: jax.Array, color_jitter_s: float = 0.25,
                     color_jitter_p: float = 0.2, blur_prob: float = 0.5
                     ) -> jax.Array:
    """jitter (prob 1 - p, matching `color_jitter > p`) then blur (prob 0.5)
    on normalized images (dacs_transforms.py:11-30)."""
    kj, kjp, kb, kbp = jax.random.split(rng, 4)
    img01 = denorm(img, mean, std)
    do_jit = jax.random.uniform(kjp, ()) > color_jitter_p
    jit = color_jitter(kj, img01, color_jitter_s)
    img01 = jnp.where(do_jit, jit, img01)
    out = renorm(img01, mean, std)
    do_blur = jax.random.uniform(kbp, ()) > 0.5 if blur_prob > 0 else False
    if blur_prob > 0:
        blurred = gaussian_blur(kb, out)
        out = jnp.where(do_blur, blurred, out)
    return out


def class_mix_masks(rng: jax.Array, labels: jax.Array, num_classes: int = 19,
                    ignore_index: int = 255) -> jax.Array:
    """ClassMix: per sample, select exactly ceil(n/2) of the n PRESENT
    classes uniformly at random (dacs_transforms.py:96-126: randperm over
    torch.unique(labels)). Returns float mask [B, H, W] in {0, 1}.

    Static-shape formulation: give every class an iid uniform score, push
    absent classes to +inf, and pick the k lowest-scoring classes — a
    uniformly random k-subset of the present ones without dynamic shapes."""
    b = labels.shape[0]
    class_ids = jnp.arange(num_classes)
    present = jnp.any(
        labels[:, :, :, None] == class_ids[None, None, None, :], axis=(1, 2))
    n = jnp.sum(present.astype(jnp.int32), axis=1)
    k = (n + 1) // 2                                  # ceil(n/2)
    scores = jnp.where(present, jax.random.uniform(rng, (b, num_classes)),
                       jnp.inf)
    order = jnp.argsort(scores, axis=1)
    rank = jnp.argsort(order, axis=1)
    pick = (rank < k[:, None]) & present              # [B, C] bool
    pick = jnp.concatenate(
        [pick, jnp.zeros((b, 1), bool)], axis=1)      # ignore slot
    safe = jnp.where(labels == ignore_index, num_classes, labels)
    return jnp.take_along_axis(
        pick.astype(jnp.float32), safe.reshape(b, -1), axis=1
    ).reshape(labels.shape)


def one_mix(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask*a + (1-mask)*b with broadcast (dacs_transforms.py:118-126)."""
    while mask.ndim < a.ndim:
        mask = mask[..., None]
    return mask * a + (1.0 - mask) * b


def block_mask(rng: jax.Array, img: jax.Array, mask_ratio: float = 0.7,
               block_size: int = 64) -> jax.Array:
    """BlockMaskGenerator.mask_image (masking_transforms.py:20-40)."""
    b, h, w, _ = img.shape
    mh, mw = max(round(h / block_size), 1), max(round(w / block_size), 1)
    keep = (jax.random.uniform(rng, (b, mh, mw, 1)) > mask_ratio).astype(
        img.dtype)
    keep = resize(keep, size=(h, w), method="nearest")
    return img * keep
