"""VQ-f4 codec tests: parameter parity, shapes, and quantizer semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.models.vq import VectorQuantizer, VQModelInterface

DDCONFIG = dict(double_z=False, z_channels=3, resolution=512, in_channels=3, out_ch=3,
                ch=128, ch_mult=[1, 2, 4], num_res_blocks=2, attn_resolutions=[],
                dropout=0.0)

# Golden counts measured from the reference on CPU (model.py:368-568 + taming
# quantizer + 1x1 quant convs): encoder 22,337,411 / decoder 32,960,771 /
# quant convs 12+12 / codebook 24,576 => 55,322,782.
REF_TOTAL = 55_322_782


def _count(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def vq():
    model = VQModelInterface(embed_dim=3, n_embed=8192, ddconfig=DDCONFIG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, variables


def test_param_count_matches_reference(vq):
    model, variables = vq
    assert _count(variables["params"]) == REF_TOTAL


def test_encode_decode_shapes(vq):
    model, variables = vq
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    h = model.apply(variables, x, method=model.encode)
    assert h.shape == (2, 16, 16, 3)   # f=4 with ch_mult [1,2,4]
    y = model.apply(variables, h, method=model.decode)
    assert y.shape == (2, 64, 64, 3)


def test_quantizer_picks_nearest_code():
    q = VectorQuantizer(n_embed=4, embed_dim=2)
    variables = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 2)))
    codebook = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    variables = {"params": {"embedding": codebook}}
    z = jnp.array([[[[0.1, -0.1], [0.9, 0.2]],
                    [[-0.2, 0.8], [1.2, 1.1]]]])
    z_q = q.apply(variables, z)
    expected = jnp.array([[[[0.0, 0.0], [1.0, 0.0]],
                           [[0.0, 1.0], [1.0, 1.0]]]])
    np.testing.assert_allclose(np.asarray(z_q), np.asarray(expected), atol=1e-6)


def test_quantizer_straight_through_gradient():
    q = VectorQuantizer(n_embed=8, embed_dim=2)
    variables = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 2)))

    def loss(z):
        return jnp.sum(q.apply(variables, z) ** 2)

    g = jax.grad(loss)(jnp.ones((1, 1, 1, 2)))
    # straight-through: dL/dz = dL/dz_q exactly
    zq = q.apply(variables, jnp.ones((1, 1, 1, 2)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * zq), atol=1e-6)


def test_decode_quantizes_by_default(vq):
    model, variables = vq
    h = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 3))
    y_q = model.apply(variables, h, method=model.decode)
    y_nq = model.apply(variables, h, True, method=model.decode)
    # quantization must change the decoder input (random codebook != identity)
    assert float(jnp.abs(y_q - y_nq).max()) > 1e-6
