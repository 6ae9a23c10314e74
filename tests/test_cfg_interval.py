"""Guidance-interval CFG (SamplerConfig.cfg_interval, arXiv 2404.07724).

No reference counterpart (/root/reference guides every DDIM step,
ddim.py:177-184): CFG applies only on scan positions [lo*S, hi*S); outside,
only the conditional branch evaluates. Invariants under test:

* full coverage is bit-identical to the unrestricted sampler (scan + host),
* zero coverage equals the cond-only (use_cfg=False) trajectory,
* host blocks == scanned segments for exact DDIM (incl. eta > 0),
* cached/scheduled host drives match an independent step-by-step reference
  loop (validates the forced refresh at the interval entry and the cache
  fan-out slicing on unguided steps),
* unsupported combinations raise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.core.cache_schedule import validate_positions
from stedm_tpu.core.ddim import (DDIMParams, ddim_step, guided_range,
                                 rescaled_cfg)


@pytest.fixture(scope="module")
def tiny():
    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.models.stedm import STEDM

    patch = 32
    model = STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=32,
                         num_res_blocks=1, channel_mult=(1, 4, 8), num_heads=4,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=64, ddconfig=dict(
            double_z=False, z_channels=3, resolution=patch, in_channels=3,
            out_ch=3, ch=32, ch_mult=[1, 2, 4], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean", style_sampling="nearby", patch_size=patch,
        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    b = 2
    batch = {
        "segmentation": jnp.zeros((b, patch, patch, 2)).at[..., 0].set(1.0),
        "style_imgs": jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (b, 1, patch, patch, 3)),
            jnp.float32),
    }
    img0 = jnp.zeros((b, patch, patch, 3))
    params = model.init(rng, img0, batch["segmentation"], batch["style_imgs"],
                        jnp.zeros((b,), jnp.int32))["params"]
    # zero-mean random perturbation (NOT a constant bias): un-zeros the
    # zero-init output convs without biasing eps, and makes the cond/uncond
    # style contexts produce clearly different predictions — a constant-bias
    # tweak leaves e_cond ≈ e_uncond and explodes the trajectory until the VQ
    # codebook saturates, hiding the guidance interval's effect entirely
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        p + jax.random.normal(k, p.shape, p.dtype) * 0.02 if p.ndim >= 2 else p
        for p, k in zip(leaves, keys)])
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    return model, schedule, params, batch


# high guidance scale so guided-vs-unguided steps differ far above float noise
BASE = dict(ddim_steps=12, eta=0.0, cfg_scale=7.5, rescale_phi=0.7,
            batched_cfg=True, downsample=4)


def test_guided_range():
    assert guided_range(50, None) == (0, 50)
    assert guided_range(50, (0.0, 1.0)) == (0, 50)
    assert guided_range(50, (0.2, 0.7)) == (10, 35)
    assert guided_range(13, (0.2, 0.7)) == (3, 9)
    with pytest.raises(ValueError):
        guided_range(50, (0.7, 0.2))
    with pytest.raises(ValueError):
        guided_range(50, (-0.1, 0.5))


def manual_sample(model, schedule, cfg, params, batch, rng):
    """Independent step-by-step reference for the cached + guided semantics:
    a plain Python loop over model.apply calls — no blocks, no scans."""
    ddim = DDIMParams.create(schedule, cfg.ddim_steps, cfg.eta)
    S = ddim.num_steps
    glo, ghi = guided_range(S, cfg.cfg_interval)
    guided = np.zeros(S, bool)
    guided[glo:ghi] = True
    if cfg.cache_schedule is not None:
        refresh = set(validate_positions(cfg.cache_schedule, S))
    else:
        refresh = set(range(0, S, max(1, cfg.cache_interval)))
    if ghi > glo and glo < S:
        refresh.add(glo)

    var = {"params": {k: v for k, v in params.items() if k != "logvar"}}
    seg = batch["segmentation"]
    b, p = seg.shape[0], seg.shape[1]
    seg_cond = model.apply(var, seg, method=model.cond_encode)
    style_c = model.apply(var, batch["style_imgs"], method=model.style_encode)
    style_u = model.apply(var, jnp.zeros_like(batch["style_imgs"]) - 2.0,
                          method=model.style_encode)
    ctx2 = jnp.concatenate([style_c, style_u])

    stochastic = cfg.eta > 0
    rng_steps = None
    if stochastic:
        rng, rng_steps = jax.random.split(rng)
    x = jax.random.normal(
        rng, (b, p // cfg.downsample, p // cfg.downsample, cfg.latent_channels),
        dtype=jnp.float32)
    keys = jax.random.split(rng_steps, S) if stochastic else None

    order = np.arange(S - 1, -1, -1)
    consts = [np.asarray(a)[order] for a in
              (ddim.timesteps, ddim.alphas, ddim.alphas_prev, ddim.sigmas,
               ddim.sqrt_one_minus_alphas)]

    cache, cache_guided = None, False
    caching = cfg.cache_interval > 1 or cfg.cache_schedule is not None
    for k in range(S):
        ts = jnp.full((b,), int(consts[0][k]), jnp.int32)
        g = bool(guided[k])
        if caching and k in refresh:
            ctx_k = ctx2 if g else style_c
            out, cache = model.apply(var, x, ts, seg_cond, ctx_k, 1,
                                     method=model.eps_full)
            cache_guided = g
        elif caching:
            c = (jax.tree_util.tree_map(lambda a: a[:b], cache)
                 if cache_guided and not g else cache)
            out = model.apply(var, x, ts, seg_cond, c, 1,
                              method=model.eps_cached)
        else:
            ctx_k = ctx2 if g else style_c
            out = model.apply(var, x, ts, seg_cond, ctx_k, method=model.eps)
        if g:
            e_t = rescaled_cfg(out[:b], out[b:], cfg.cfg_scale, cfg.rescale_phi)
        else:
            e_t = out.astype(jnp.float32)
        noise = (jax.random.normal(keys[k], x.shape, dtype=jnp.float32)
                 if stochastic else None)
        x = ddim_step(x, e_t, float(consts[1][k]), float(consts[2][k]),
                      float(consts[3][k]), float(consts[4][k]), noise=noise)[0]
    img = model.apply(var, x, method=model.decode_first_stage)
    return jnp.clip(img, -1.0, 1.0)


class TestExact:
    def test_full_coverage_is_identity(self, tiny):
        from stedm_tpu.train.host_sampler import make_host_sample_fn
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        rng = jax.random.PRNGKey(3)
        ref = jax.jit(make_sample_fn(
            model, schedule, SamplerConfig(**BASE)))(params, batch, rng)
        cfg = SamplerConfig(cfg_interval=(0.0, 1.0), **BASE)
        scan = jax.jit(make_sample_fn(model, schedule, cfg))(params, batch, rng)
        host = make_host_sample_fn(model, schedule, cfg)(params, batch, rng)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(scan))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(host), atol=1e-3)

    def test_zero_coverage_equals_cond_only(self, tiny):
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        rng = jax.random.PRNGKey(4)
        uncond = jax.jit(make_sample_fn(
            model, schedule,
            SamplerConfig(**{**BASE, "use_cfg": False})))(params, batch, rng)
        zero = jax.jit(make_sample_fn(
            model, schedule,
            SamplerConfig(cfg_interval=(0.0, 0.0), **BASE)))(params, batch, rng)
        np.testing.assert_allclose(np.asarray(uncond), np.asarray(zero),
                                   atol=1e-6)

    @pytest.mark.parametrize("eta", [0.0, 0.3])
    def test_host_matches_scan(self, tiny, eta):
        from stedm_tpu.train.host_sampler import make_host_sample_fn
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        cfg = SamplerConfig(cfg_interval=(0.2, 0.7), **{**BASE, "eta": eta})
        rng = jax.random.PRNGKey(5)
        scan = jax.jit(make_sample_fn(model, schedule, cfg))(params, batch, rng)
        host = make_host_sample_fn(model, schedule, cfg)(params, batch, rng)
        np.testing.assert_allclose(np.asarray(scan), np.asarray(host),
                                   atol=1e-3)
        # the interval actually changes the trajectory vs full guidance
        full = jax.jit(make_sample_fn(
            model, schedule,
            SamplerConfig(**{**BASE, "eta": eta})))(params, batch, rng)
        assert float(jnp.abs(full - scan).max()) > 0.05

    def test_manual_reference_matches_exact(self, tiny):
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        cfg = SamplerConfig(cfg_interval=(0.2, 0.7), **BASE)
        rng = jax.random.PRNGKey(6)
        scan = jax.jit(make_sample_fn(model, schedule, cfg))(params, batch, rng)
        ref = manual_sample(model, schedule, cfg, params, batch, rng)
        np.testing.assert_allclose(np.asarray(scan), np.asarray(ref),
                                   atol=1e-3)


class TestCached:
    @pytest.mark.parametrize("serving", [dict(cache_interval=3),
                                         dict(cache_schedule=(0, 2, 5, 6, 10))])
    def test_host_and_scan_match_manual_reference(self, tiny, serving):
        from stedm_tpu.train.host_sampler import make_host_sample_fn
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        cfg = SamplerConfig(cfg_interval=(0.2, 0.7), **serving, **BASE)
        rng = jax.random.PRNGKey(7)
        host = make_host_sample_fn(model, schedule, cfg)(params, batch, rng)
        scan = jax.jit(make_sample_fn(model, schedule, cfg))(params, batch, rng)
        ref = manual_sample(model, schedule, cfg, params, batch, rng)
        np.testing.assert_allclose(np.asarray(host), np.asarray(ref),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(scan), np.asarray(ref),
                                   atol=1e-3)

    def test_full_coverage_cached_is_identity(self, tiny):
        from stedm_tpu.train.host_sampler import make_host_sample_fn
        from stedm_tpu.train.steps import SamplerConfig

        model, schedule, params, batch = tiny
        rng = jax.random.PRNGKey(8)
        ref = make_host_sample_fn(
            model, schedule,
            SamplerConfig(cache_interval=3, **BASE))(params, batch, rng)
        got = make_host_sample_fn(
            model, schedule,
            SamplerConfig(cache_interval=3, cfg_interval=(0.0, 1.0),
                          **BASE))(params, batch, rng)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestValidation:
    def test_boundary_windows_run(self, tiny):
        """Guided window touching either trajectory end (no entry or no exit
        segment) still runs through the combined scan."""
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        for window in ((0.0, 0.5), (0.5, 1.0)):
            cfg = SamplerConfig(cache_interval=3, cfg_interval=window, **BASE)
            out = jax.jit(make_sample_fn(model, schedule, cfg))(
                params, batch, jax.random.PRNGKey(9))
            ref = manual_sample(model, schedule, cfg, params, batch,
                                jax.random.PRNGKey(9))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-3)

    def test_non_ddim_raises(self, tiny):
        from stedm_tpu.train.host_sampler import make_host_sample_fn
        from stedm_tpu.train.steps import SamplerConfig

        model, schedule, _, _ = tiny
        cfg = SamplerConfig(cfg_interval=(0.2, 0.7),
                            **{**BASE, "method": "plms"})
        with pytest.raises(ValueError):
            make_host_sample_fn(model, schedule, cfg)
