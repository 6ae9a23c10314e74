"""PLMS and DPM-Solver++ sanity: on an analytically-solvable Gaussian score model,
higher-order samplers should be at least as accurate as few-step DDIM."""

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.core.ddim import DDIMParams, ddim_sample
from stedm_tpu.core.dpm_solver import dpm_solver_pp_sample
from stedm_tpu.core.plms import plms_sample
from stedm_tpu.core.schedules import DiffusionSchedule


def _setup():
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    # exact eps for data ~ N(mu, s^2 I): eps*(x,t) = (x - a_t*mu)/sqrt(a_t^2 s^2+(1-a_t^2)) * ...
    mu, s = 0.3, 0.05
    ac = schedule.alphas_cumprod

    def eps_fn(x, t):
        a = jnp.sqrt(ac[t])[:, None, None, None]
        var = a ** 2 * s ** 2 + (1 - a ** 2)
        return (x - a * mu) * jnp.sqrt(1 - a ** 2) / var

    return schedule, eps_fn, mu, s


def test_ddim_plms_dpm_converge_to_data_mean():
    schedule, eps_fn, mu, s = _setup()
    x_T = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))

    params = DDIMParams.create(schedule, 20)
    x_ddim = np.asarray(ddim_sample(eps_fn, x_T, params))
    x_plms = np.asarray(plms_sample(eps_fn, x_T, params))
    x_dpm = np.asarray(dpm_solver_pp_sample(eps_fn, x_T, schedule, 20))

    for name, x in [("ddim", x_ddim), ("plms", x_plms), ("dpm", x_dpm)]:
        assert np.all(np.isfinite(x)), name
        err = abs(float(x.mean()) - mu)
        assert err < 0.08, (name, float(x.mean()))
    # samples spread should be in the right ballpark of the data std
    assert 0.005 < float(x_dpm.std()) < 0.3


def test_higher_order_beats_few_step_ddim():
    schedule, eps_fn, mu, s = _setup()
    x_T = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    params = DDIMParams.create(schedule, 8)
    err = lambda x: abs(float(np.asarray(x).mean()) - mu)
    e_ddim = err(ddim_sample(eps_fn, x_T, params))
    e_plms = err(plms_sample(eps_fn, x_T, params))
    e_dpm = err(dpm_solver_pp_sample(eps_fn, x_T, schedule, 8))
    assert e_plms <= e_ddim * 1.5
    assert e_dpm <= e_ddim * 1.5


def test_cfg_pair_contract():
    schedule, eps_fn, *_ = _setup()
    params = DDIMParams.create(schedule, 4)
    pair_fn = lambda x, t: (eps_fn(x, t), 0.9 * eps_fn(x, t))
    x_T = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    for sampler in (lambda: plms_sample(pair_fn, x_T, params, cfg_scale=1.5),
                    lambda: dpm_solver_pp_sample(pair_fn, x_T, schedule, 4,
                                                 cfg_scale=1.5)):
        out = np.asarray(sampler())
        assert out.shape == x_T.shape and np.all(np.isfinite(out))
