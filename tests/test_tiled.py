"""Tiled-apply tests: identity stitching, resolution scaling, and agreement with a
direct full-canvas call for a shift-invariant function."""

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.ops.tiled import tiled_apply


def test_identity_function_reconstructs_canvas():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 40, 56, 3)).astype(np.float32))
    out = tiled_apply(lambda t: t, x, patch=16, stride=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_pointwise_function_matches_direct():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 2)).astype(np.float32))
    fn = lambda t: jnp.tanh(t) * 2.0 + 1.0
    out = tiled_apply(fn, x, patch=16, stride=12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x)), rtol=1e-5,
                               atol=1e-5)


def test_upscaling_function():
    x = jnp.ones((1, 16, 16, 3))
    fn = lambda t: jnp.repeat(jnp.repeat(t, 2, 1), 2, 2)[..., :1] * 3.0
    out = tiled_apply(fn, x, patch=8, stride=4, out_channels=1, scale=2)
    assert out.shape == (1, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_jits_and_ragged_edges():
    x = jnp.ones((1, 30, 22, 3))  # not multiples of stride
    fn = jax.jit(lambda t: tiled_apply(lambda p: p * 2.0, t, patch=16, stride=10))
    out = fn(x)
    assert out.shape == (1, 30, 22, 3)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)
