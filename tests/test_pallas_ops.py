"""Pallas kernel tests (interpret mode on CPU): nearest-code search."""

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.ops.quantize import (
    _nearest_code_pallas,
    nearest_code,
    nearest_code_reference,
)


def test_nearest_code_pallas_matches_reference():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(8192, 3)).astype(np.float32))
    ref = np.asarray(nearest_code_reference(z, cb))
    got = np.asarray(_nearest_code_pallas(z, cb, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_nearest_code_pallas_ragged_tokens():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(1500, 3)).astype(np.float32))  # not tile-aligned
    cb = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32))
    ref = np.asarray(nearest_code_reference(z, cb))
    got = np.asarray(_nearest_code_pallas(z, cb, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_nearest_code_dispatch_cpu_fallback():
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    got = np.asarray(nearest_code(z, cb))
    ref = np.asarray(nearest_code_reference(z, cb))
    np.testing.assert_array_equal(got, ref)


def test_quantizer_still_correct_via_dispatch():
    from stedm_tpu.models.vq import VectorQuantizer

    q = VectorQuantizer(n_embed=16, embed_dim=3)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 3))
    variables = q.init(jax.random.PRNGKey(1), z)
    z_q = q.apply(variables, z)
    cb = np.asarray(variables["params"]["embedding"])
    flat = np.asarray(z).reshape(-1, 3)
    d = ((flat[:, None] - cb[None]) ** 2).sum(-1)
    expected = cb[d.argmin(1)].reshape(z.shape)
    np.testing.assert_allclose(np.asarray(z_q), expected, atol=1e-6)
