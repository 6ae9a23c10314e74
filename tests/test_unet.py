"""U-Net architecture tests: parameter-count parity with the reference and
shape/zero-init behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.models.unet import UNet

# Golden: torch UNetModel with the shipped landscape.yaml params has 234,635,139
# parameters (measured from reference openaimodel.py:435-806 on CPU), split
# time_embed 328,704 / input_blocks 46,118,912 / middle 62,417,920 /
# output_blocks 125,765,888 / out 3,715.
LANDSCAPE = dict(image_size=128, in_channels=6, out_channels=3, model_channels=128,
                 attention_resolutions=(32, 16, 8), num_res_blocks=2,
                 channel_mult=(1, 4, 8), num_heads=8)


def _count(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def unet_small():
    model = UNet(**{**LANDSCAPE, "model_channels": 32, "num_heads": 4})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                           jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)))
    return model, variables


def test_param_count_matches_reference():
    model = UNet(**LANDSCAPE)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                           jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512))))
    assert _count(variables["params"]) == 234_635_139


def test_forward_shape_and_zero_init(unet_small):
    model, variables = unet_small
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6))
    t = jnp.array([3, 700], dtype=jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 512))
    y = model.apply(variables, x, t, ctx)
    assert y.shape == (2, 16, 16, 3)
    # the final conv is zero-initialized (reference zero_module, openaimodel.py:732)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_style_context_reaches_bottleneck(unet_small):
    """Different style vectors must change activations (ResBlockStyle injection)."""
    model, variables = unet_small
    # un-zero the final conv so bottleneck differences reach the output
    params = variables["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 6))
    t = jnp.array([10], dtype=jnp.int32)
    y1 = model.apply({"params": params}, x, t, jnp.zeros((1, 512)))
    y2 = model.apply({"params": params}, x, t, 5.0 + jnp.zeros((1, 512)))
    assert float(jnp.abs(y1 - y2).max()) > 1e-6


def test_timestep_changes_output(unet_small):
    model, variables = unet_small
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, variables["params"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 6))
    ctx = jnp.zeros((1, 512))
    y1 = model.apply({"params": params}, x, jnp.array([0], jnp.int32), ctx)
    y2 = model.apply({"params": params}, x, jnp.array([999], jnp.int32), ctx)
    assert float(jnp.abs(y1 - y2).max()) > 1e-6


def test_spatial_transformer_mode_runs():
    model = UNet(**{**LANDSCAPE, "model_channels": 32, "num_heads": 4},
                 use_spatial_transformer=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                           jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)))
    y = model.apply(variables, jnp.ones((1, 16, 16, 6)),
                    jnp.array([5], jnp.int32), jnp.ones((1, 512)))
    assert y.shape == (1, 16, 16, 3)


def test_bf16_compute():
    model = UNet(**{**LANDSCAPE, "model_channels": 32, "num_heads": 4},
                 dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                           jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)))
    y = model.apply(variables, jnp.ones((1, 16, 16, 6), jnp.float32),
                    jnp.array([5], jnp.int32), jnp.ones((1, 512)))
    # params stay fp32, output cast back to input dtype
    assert y.dtype == jnp.float32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32


def test_use_checkpoint_remat_matches_plain():
    """use_checkpoint (jax.checkpoint per ResBlock — the reference's per-block
    activation checkpointing, openaimodel.py:263-265) must not change forward
    outputs or gradients, only the memory/FLOPs tradeoff."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stedm_tpu.models.unet import UNet

    kw = dict(in_channels=6, out_channels=3, model_channels=32,
              num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
              attention_resolutions=(32, 16, 8))
    plain = UNet(**kw)
    remat = UNet(use_checkpoint=True, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 6)),
                    jnp.float32)
    t = jnp.array([3, 500], jnp.int32)
    ctx = jnp.asarray(np.random.default_rng(1).normal(size=(2, 512)), jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    out_p = plain.apply({"params": params}, x, t, ctx)
    out_r = remat.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply({"params": p}, x, t, ctx) ** 2)
        return f

    g_p = jax.grad(loss(plain))(params)
    g_r = jax.grad(loss(remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
