"""Tests for the scanned DDIM sampler and rescaled CFG numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.core.ddim import DDIMParams, ddim_sample, ddim_step, rescaled_cfg
from stedm_tpu.core.schedules import DiffusionSchedule


def _schedule():
    return DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)


def test_rescaled_cfg_matches_torch_semantics():
    """Reference ddim.py:179-184: std over torch dims (1,2) of NCHW with Bessel's
    correction, i.e. per-(batch, width) normalization."""
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 8, 8, 3
    e_t = rng.normal(size=(b, h, w, c)).astype(np.float32)
    e_u = rng.normal(size=(b, h, w, c)).astype(np.float32)
    scale, phi = 1.5, 0.7

    # independent NCHW computation with explicit Bessel correction
    et_nchw = np.transpose(e_t, (0, 3, 1, 2))
    eu_nchw = np.transpose(e_u, (0, 3, 1, 2))
    ew = eu_nchw + scale * (et_nchw - eu_nchw)
    std = lambda a: a.std(axis=(1, 2), keepdims=True, ddof=1)
    expected = ew * (std(et_nchw) / std(ew)) * phi + (1 - phi) * et_nchw
    expected = np.transpose(expected, (0, 2, 3, 1))

    got = np.asarray(rescaled_cfg(jnp.asarray(e_t), jnp.asarray(e_u), scale, phi))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6)


def test_ddim_step_golden():
    """One update against hand-computed x_prev (reference ddim.py:200-209)."""
    x = jnp.full((1, 2, 2, 1), 0.5)
    e = jnp.full((1, 2, 2, 1), -0.25)
    a_t, a_prev = 0.5, 0.8
    x_prev, pred_x0 = ddim_step(x, e, a_t, a_prev, 0.0, np.sqrt(1 - a_t))
    exp_x0 = (0.5 - np.sqrt(0.5) * -0.25) / np.sqrt(0.5)
    exp_prev = np.sqrt(0.8) * exp_x0 + np.sqrt(1 - 0.8) * -0.25
    np.testing.assert_allclose(np.asarray(pred_x0)[0, 0, 0, 0], exp_x0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x_prev)[0, 0, 0, 0], exp_prev, rtol=1e-6)


def test_ddim_sample_matches_python_loop():
    """The scanned trajectory must equal an explicit per-step python loop."""
    sched = _schedule()
    params = DDIMParams.create(sched, num_steps=8, eta=0.0)

    def eps_fn(x, t):
        # a fake but t- and x-dependent "model"
        return 0.1 * x + 0.01 * t[:, None, None, None].astype(jnp.float32)

    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    got = np.asarray(ddim_sample(eps_fn, x_T, params))

    x = np.asarray(x_T, dtype=np.float32)
    for i in range(params.num_steps - 1, -1, -1):
        t = np.full((2,), int(params.timesteps[i]))
        e = 0.1 * x + 0.01 * t[:, None, None, None].astype(np.float32)
        a_t = float(params.alphas[i]); a_prev = float(params.alphas_prev[i])
        sq1m = float(params.sqrt_one_minus_alphas[i])
        x0 = (x - sq1m * e) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * e
    np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)


def test_ddim_sample_cfg_pair_path():
    sched = _schedule()
    params = DDIMParams.create(sched, num_steps=4, eta=0.0)

    def eps_pair_fn(x, t):
        return 0.1 * x, 0.05 * x

    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    out = ddim_sample(eps_pair_fn, x_T, params, cfg_scale=1.5)
    assert out.shape == x_T.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # cfg_scale=1.0 must follow the single-branch path exactly
    out_nocfg = ddim_sample(lambda x, t: 0.1 * x, x_T, params, cfg_scale=1.0)
    assert np.all(np.isfinite(np.asarray(out_nocfg)))


def test_ddim_sample_jits():
    sched = _schedule()
    params = DDIMParams.create(sched, num_steps=4)
    fn = jax.jit(lambda x: ddim_sample(lambda y, t: 0.1 * y, x, params))
    out = fn(jnp.ones((1, 4, 4, 3)))
    assert out.shape == (1, 4, 4, 3)
