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


@pytest.mark.parametrize("kw,unroll", [
    # sparse schedule, budget 3: blocks [3,3,2] — the second block starts
    # MID-PERIOD (step 3, governing refresh at 0) and must consume the carried
    # cache; the refresh at 5 lands inside block 2
    (dict(cfg_scale=1.5, batched_cfg=True, ddim_steps=8,
          cache_schedule=(0, 5)), 3),
    # composed with a guidance window: forced refresh at the window entry,
    # guided (2B) cache carried across a boundary, then an unguided refresh
    # shrinks it to B rows
    (dict(cfg_scale=1.5, batched_cfg=True, ddim_steps=8,
          cache_schedule=(0, 5), cfg_interval=(0.25, 0.75)), 3),
    # uniform-interval serving mode chunked off the refresh grid
    (dict(cfg_scale=1.5, batched_cfg=True, ddim_steps=7, cache_interval=3), 2),
    # no CFG
    (dict(cfg_scale=1.0, use_cfg=False, ddim_steps=8,
          cache_schedule=(0, 5)), 3),
    # stochastic serving mode (per-step key sequence must stay aligned)
    (dict(cfg_scale=1.5, batched_cfg=True, eta=0.3, ddim_steps=8,
          cache_schedule=(0, 5)), 3),
])
def test_carry_cache_matches_scan(tiny, kw, unroll):  # noqa: F811
    """Cross-block cache carry (`carry_cache=True`): the trajectory chunks
    into uniform blocks whose boundaries need not sit on refresh positions —
    the deep-feature cache threads between block programs as a donated
    argument. Must be trajectory-identical to the scanned sampler (and hence
    to the non-carry host drive, which is already scan-parity-tested)."""
    model, params, batch, schedule = tiny
    cfg = SamplerConfig(eta=kw.pop("eta", 0.0), rescale_phi=0.7, downsample=4,
                        **kw)
    rng = jax.random.PRNGKey(3)
    scan = np.asarray(jax.jit(make_sample_fn(model, schedule, cfg))(
        params, batch, rng))
    host = np.asarray(make_host_sample_fn(model, schedule, cfg, unroll=unroll,
                                          carry_cache=True)(
        params, batch, rng))
    np.testing.assert_allclose(host, scan, atol=2e-5)


def test_carry_cache_partition_is_uniform(tiny):  # noqa: F811
    """The carry partition must never produce an oversized block: a long
    refresh period chunks into budget-sized programs (the non-carry coalesce
    would emit one 5-step block here)."""
    model, params, batch, schedule = tiny
    cfg = SamplerConfig(ddim_steps=8, cfg_scale=1.5, batched_cfg=True,
                        rescale_phi=0.7, downsample=4, cache_schedule=(0, 5))
    import os

    fn = make_host_sample_fn(model, schedule, cfg, unroll=3, carry_cache=True)
    os.environ["STEDM_HOST_BLOCK_TIMING"] = "1"
    try:
        import contextlib
        import io

        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            fn(params, batch, jax.random.PRNGKey(0))
        line = [ln for ln in err.getvalue().splitlines()
                if ln.startswith("block times")][0]
        sizes = [int(tok.split(":")[0]) for tok in line.split()[3:]]
        assert sizes == [3, 3, 2]
    finally:
        os.environ["STEDM_HOST_BLOCK_TIMING"] = "0"


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
