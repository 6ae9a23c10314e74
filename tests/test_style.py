"""Style encoder tests: Swin-V2-T, aggregation blocks, set-ViT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.models.agg import AggLinear, AggMax, AggMean, AggNone
from stedm_tpu.models.svit import SViT
from stedm_tpu.models.swin import SwinV2, swin_v2_tiny


def _count(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def test_swin_v2_t_output_and_param_scale():
    model = swin_v2_tiny(num_classes=512)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    n = _count(variables["params"])
    # swin_v2_t is ~28.35M with a 1000-class head; with the 512-d head
    # (reference s_zss_dm.py:20) the total lands near 27.9M
    assert 26_000_000 < n < 30_000_000


def test_swin_forward_small():
    model = SwinV2(embed_dim=24, depths=(1, 1), num_heads=(2, 4), window=4,
                   num_classes=512)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(y)))
    # style-image content must matter
    y2 = model.apply(variables, x * 0.1)
    assert float(jnp.abs(y - y2).max()) > 1e-5


@pytest.mark.parametrize("agg_cls,n", [(AggMean, 3), (AggMax, 3), (AggLinear, 2)])
def test_agg_blocks(agg_cls, n):
    embedder = SwinV2(embed_dim=24, depths=(1, 1), num_heads=(2, 4), window=4,
                      num_classes=512)
    kwargs = {"num_patches": n} if agg_cls is AggLinear else {}
    agg = agg_cls(embedder, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, n, 32, 32, 3))
    variables = agg.init(jax.random.PRNGKey(1), x)
    y = agg.apply(variables, x)
    assert y.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(y)))


def test_agg_mean_is_permutation_invariant():
    embedder = SwinV2(embed_dim=24, depths=(1, 1), num_heads=(2, 4), window=4,
                      num_classes=512)
    agg = AggMean(embedder)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32, 3))
    variables = agg.init(jax.random.PRNGKey(1), x)
    y1 = agg.apply(variables, x)
    y2 = agg.apply(variables, x[:, ::-1])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_agg_none_zeros():
    agg = AggNone()
    x = jnp.ones((4, 1, 8, 8, 3))
    y = agg.apply(agg.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_array_equal(np.asarray(y), np.zeros((4, 512)))


def test_svit_forward():
    model = SViT(image_size=32, patch_size=8, num_classes=512, dim=64, depth=2,
                 heads=4, mlp_dim=64, ns=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(y)))


def test_svit_time_token_path():
    model = SViT(image_size=32, patch_size=8, num_classes=64, dim=32, depth=1,
                 heads=2, mlp_dim=32, ns=1, t_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32, 3))
    t_emb = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    variables = model.init(jax.random.PRNGKey(1), x, t_emb)
    y0 = model.apply(variables, x)
    y1 = model.apply(variables, x, t_emb)
    assert y0.shape == y1.shape == (2, 64)
    assert float(jnp.abs(y0 - y1).max()) > 1e-6
