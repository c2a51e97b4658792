"""Guards for bench.py's gate-calibration helpers (the driver runs bench.py
unattended on real hardware — these catch regressions on CPU first)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench():
    import bench

    return bench


def test_calibrate_logit_scale_hits_target():
    """On a smooth random logit field the bisection must land near the
    target skip rate, and the rate must be monotone in the scale."""
    bench = _bench()
    ctx = jax.random.normal(jax.random.PRNGKey(0), (24, 16, 16, 19))
    s, achieved = bench.calibrate_logit_scale(ctx, threshold=0.968, conf=0.8)
    assert s > 0
    assert abs(achieved - bench.TARGET_SKIP_RATE) < 0.1

    def rate(scale):
        probs = jax.nn.softmax(ctx * scale, axis=-1)
        win = jnp.mean((jnp.max(probs, -1) > 0.968).astype(jnp.float32),
                       axis=(1, 2))
        return float(jnp.mean((win >= 0.8).astype(jnp.float32)))

    assert rate(s * 4) >= rate(s) >= rate(s / 4)


def test_scale_decode_head_scales_only_conv_seg():
    bench = _bench()
    variables = {
        "params": {
            "backbone": {"w": jnp.ones((3,))},
            "decode_head": {
                "conv_seg": {"kernel": jnp.full((2, 2), 2.0),
                             "bias": jnp.ones((2,))},
                "fuse": {"kernel": jnp.ones((2, 2))},
            },
        }
    }
    v2 = bench.scale_decode_head(variables, 3.0)
    np.testing.assert_allclose(
        np.asarray(v2["params"]["decode_head"]["conv_seg"]["kernel"]), 6.0)
    np.testing.assert_allclose(
        np.asarray(v2["params"]["decode_head"]["conv_seg"]["bias"]), 3.0)
    # everything else untouched (including the original tree)
    np.testing.assert_allclose(
        np.asarray(v2["params"]["decode_head"]["fuse"]["kernel"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["decode_head"]["conv_seg"]["kernel"]),
        2.0)


def test_scale_decode_head_rejects_headless_models():
    bench = _bench()
    variables = {"params": {"decode_head": {"fuse": {"kernel": jnp.ones(2)}}}}
    with pytest.raises(ValueError, match="conv_seg"):
        bench.scale_decode_head(variables, 2.0)
