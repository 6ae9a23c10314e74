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


def _canvas_setup():
    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.models.stedm import STEDM

    patch = 32
    model = STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=32,
                         num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=64, ddconfig=dict(
            double_z=False, z_channels=3, resolution=patch, in_channels=3, out_ch=3,
            ch=32, ch_mult=[1, 2, 4], num_res_blocks=1, attn_resolutions=[],
            dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean", style_sampling="nearby", patch_size=patch,
    )
    rng = np.random.default_rng(7)
    canvas = 64
    batch = {
        "segmentation": jnp.zeros((1, canvas, canvas, 2)).at[..., 0].set(1.0),
        "style_imgs": jnp.asarray(
            rng.uniform(-1, 1, (1, 1, patch, patch, 3)), jnp.float32),
    }
    img0 = jnp.zeros((1, patch, patch, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img0,
                        batch["segmentation"][:, :patch, :patch],
                        batch["style_imgs"], jnp.zeros((1,), jnp.int32))["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.01 if p.ndim == 4 else p, params)
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    return model, params, batch, schedule, canvas


def test_canvas_sampling_2x2_patches_seam_free():
    """A 2-patch-wide canvas through the tiled eps/decode path (the reference's
    fold/unfold role, ddpm.py:905-987): matches the full-context sampler run on
    the same canvas (model cloned with patch_size=canvas) up to tile-context
    effects, with no stitching discontinuity at tile boundaries."""
    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    model, params, batch, schedule, canvas = _canvas_setup()
    cfg = SamplerConfig(ddim_steps=4, eta=0.0, cfg_scale=1.5, rescale_phi=0.7,
                        batched_cfg=True, downsample=4)
    key = jax.random.PRNGKey(5)

    tiled_fn = jax.jit(make_sample_fn(model, schedule, cfg))
    img_tiled = np.asarray(tiled_fn(params, batch, key))
    assert img_tiled.shape == (1, canvas, canvas, 3)
    assert np.all(np.isfinite(img_tiled))

    # same canvas through the plain (full-context) path: same params, the model
    # merely declares the canvas as its patch so make_sample_fn skips tiling
    full_fn = jax.jit(make_sample_fn(model.clone(patch_size=canvas), schedule, cfg))
    img_full = np.asarray(full_fn(params, batch, key))
    # tiles see truncated context, and with UNTRAINED weights the trajectories
    # diverge chaotically over steps — this bound only catches blowups; the
    # stitching itself is validated exactly by the identity/pointwise tests
    # above and by the seam check below
    rel = np.sqrt(((img_tiled - img_full) ** 2).mean()) / (
        np.sqrt((img_full ** 2).mean()) + 1e-8)
    assert rel < 2.0, rel

    # seam check: the mean gradient across tile-boundary pixel columns/rows must
    # stay within the image's own gradient distribution (broken weight
    # normalization shows up as an O(1) brightness step at the seams). Latent
    # tile starts {0, 6, 8} (patch 8, stride 6) -> pixel boundaries at 24/32/56.
    bounds = [23, 24, 31, 32, 55, 56]
    dx = np.abs(np.diff(img_tiled, axis=2)).mean(axis=(0, 1, 3))  # [W-1]
    dy = np.abs(np.diff(img_tiled, axis=1)).mean(axis=(0, 2, 3))
    for d in (dx, dy):
        assert d[bounds].max() < 2.0 * np.percentile(d, 90), (
            d[bounds].max(), np.percentile(d, 90))


def test_canvas_requires_batched_cfg():
    import pytest

    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    model, params, batch, schedule, canvas = _canvas_setup()
    cfg = SamplerConfig(ddim_steps=2, cfg_scale=1.5, batched_cfg=False, downsample=4)
    with pytest.raises(ValueError):
        jax.jit(make_sample_fn(model, schedule, cfg))(params, batch,
                                                      jax.random.PRNGKey(0))
