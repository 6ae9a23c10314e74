"""Host-driven sampler (`make_host_sample_fn`) vs the scanned sampler.

The host loop must reproduce the scanned trajectory exactly (same per-step
jitted math, step constants as scalar args) in every supported mode: exact
DDIM, all CFG variants, and the DeepCache-style cached serving mode."""

import jax
import numpy as np
import pytest

from stedm_tpu.train.host_sampler import host_loop_default, make_host_sample_fn
from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

from tests.test_deepcache import tiny  # noqa: F401  (fixture reuse)


def _pair(tiny, **kw):  # noqa: F811
    model, params, batch, schedule = tiny
    cfg = SamplerConfig(ddim_steps=kw.pop("ddim_steps", 6),
                        eta=kw.pop("eta", 0.0),
                        rescale_phi=0.7, downsample=4, **kw)
    scan_fn = jax.jit(make_sample_fn(model, schedule, cfg))
    host_fn = make_host_sample_fn(model, schedule, cfg)
    rng = jax.random.PRNGKey(3)
    return (np.asarray(scan_fn(params, batch, rng)),
            np.asarray(host_fn(params, batch, rng)))


@pytest.mark.parametrize("kw", [
    dict(cfg_scale=1.5, batched_cfg=True),               # shared-encoder CFG
    dict(cfg_scale=1.5, batched_cfg=False),              # two-call CFG
    dict(cfg_scale=1.0, use_cfg=False),                  # no CFG
    dict(cfg_scale=1.5, batched_cfg=True, cache_interval=2),   # serving mode
    dict(cfg_scale=1.5, batched_cfg=True, cache_interval=3,
         ddim_steps=7),                                  # ragged tail
    dict(cfg_scale=1.0, use_cfg=False, cache_interval=2),      # cached, no CFG
    dict(cfg_scale=1.5, batched_cfg=True, method="plms"),      # PLMS (AB4)
    dict(cfg_scale=1.5, batched_cfg=True, method="plms",
         ddim_steps=7),                                        # PLMS ragged
    dict(cfg_scale=1.5, batched_cfg=True, method="dpm"),       # DPM-Solver++ 2M
    dict(cfg_scale=1.0, use_cfg=False, method="dpm"),
    dict(cfg_scale=1.5, batched_cfg=True, eta=0.3),            # stochastic DDIM
    dict(cfg_scale=1.5, batched_cfg=True, eta=0.3,
         cache_interval=2),                          # stochastic serving mode
])
def test_host_matches_scan(tiny, kw):  # noqa: F811
    scan, host = _pair(tiny, **kw)
    np.testing.assert_allclose(host, scan, atol=2e-5)


def test_rejects_unsupported(tiny):  # noqa: F811
    model, params, batch, schedule = tiny
    with pytest.raises(NotImplementedError):
        make_host_sample_fn(model, schedule,
                            SamplerConfig(method="bogus"))


@pytest.mark.parametrize("kw", [
    dict(cfg_scale=1.5, batched_cfg=True),               # CFG canvas
    dict(cfg_scale=1.0, use_cfg=False),                  # uncond canvas
    dict(cfg_scale=1.5, batched_cfg=True, eta=0.3),      # stochastic canvas
])
def test_host_canvas_matches_scan(tiny, kw):  # noqa: F811
    """Tiled canvases through the host-block drive (CLAUDE.md roadmap 2): a
    2x2-patch canvas layout must follow the scanned `_sample_tiled` trajectory
    exactly (same tiled eps stitching inside each block)."""
    import jax.numpy as jnp

    model, params, batch, schedule = tiny
    p = model.patch_size
    b = int(batch["segmentation"].shape[0])
    canvas_batch = {
        "segmentation": jnp.tile(batch["segmentation"], (1, 2, 2, 1)),
        "style_imgs": batch["style_imgs"],
    }
    cfg = SamplerConfig(ddim_steps=4, eta=kw.pop("eta", 0.0), rescale_phi=0.7,
                        downsample=4, **kw)
    rng = jax.random.PRNGKey(5)
    scan = np.asarray(jax.jit(make_sample_fn(model, schedule, cfg))(
        params, canvas_batch, rng))
    host = np.asarray(make_host_sample_fn(model, schedule, cfg)(
        params, canvas_batch, rng))
    assert scan.shape == (b, 2 * p, 2 * p, 3)
    np.testing.assert_allclose(host, scan, atol=2e-5)


def test_host_canvas_rejects_cached(tiny):  # noqa: F811
    import jax.numpy as jnp

    model, params, batch, schedule = tiny
    canvas_batch = {
        "segmentation": jnp.tile(batch["segmentation"], (1, 2, 2, 1)),
        "style_imgs": batch["style_imgs"],
    }
    fn = make_host_sample_fn(model, schedule, SamplerConfig(
        ddim_steps=4, cfg_scale=1.5, batched_cfg=True, downsample=4,
        cache_interval=2))
    with pytest.raises(ValueError):
        fn(params, canvas_batch, jax.random.PRNGKey(0))


def test_rejects_eta_nonddim(tiny):  # noqa: F811
    # the reference's PLMS asserts ddim_eta == 0 (reference plms.py:30) and
    # DPM-Solver ignores eta; silently dropping the noise term would be
    # nonconformance (VERDICT r2 missing #3) — both samplers must refuse
    from stedm_tpu.train.steps import make_sample_fn as scan_fn

    model, params, batch, schedule = tiny
    for method in ("plms", "dpm"):
        with pytest.raises(ValueError):
            make_host_sample_fn(model, schedule,
                                SamplerConfig(method=method, eta=0.3))
        with pytest.raises(ValueError):
            scan_fn(model, schedule, SamplerConfig(method=method, eta=0.3))


def test_host_loop_default_cpu():
    # tests force the CPU platform, so the tunnel heuristic must say False
    assert host_loop_default() is False
