"""Golden-value tests for schedule math.

Expected constants were computed from the reference formulas
(`ldm/modules/diffusionmodules/util.py:21-74`, `ddpm.py:120-172`) in float64.
"""

import numpy as np
import pytest

from stedm_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

# active config: linear(0.0015, 0.0205, 1000) (configs/diffusion/ldm_based.yaml)
START, END, T = 0.0015, 0.0205, 1000


def test_linear_beta_schedule_golden():
    betas = make_beta_schedule("linear", T, START, END)
    assert betas.dtype == np.float64 and betas.shape == (T,)
    np.testing.assert_allclose(
        betas[[0, 1, 500, 999]],
        [0.0015, 0.00150811, 0.00828215, 0.0205],
        rtol=1e-5,
    )
    np.testing.assert_allclose(betas.sum(), 9.183576148381148, rtol=1e-12)


def test_alphas_cumprod_golden():
    sched = DiffusionSchedule.create("linear", T, START, END)
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        ac[[0, 1, 500, 999]],
        [9.98500000e-01, 9.96994153e-01, 1.07676754e-01, 9.69108668e-05],
        rtol=1e-5,
    )


def test_lvlb_weights_golden():
    sched = DiffusionSchedule.create("linear", T, START, END)
    w = np.asarray(sched.lvlb_weights)
    # t=0 entry is overwritten by t=1 (reference ddpm.py:171)
    np.testing.assert_allclose(
        w[[0, 1, 500, 999]],
        [0.50346247, 0.50346247, 0.00468425, 0.01046556],
        rtol=1e-5,
    )
    assert np.all(np.isfinite(w))


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps("uniform", 50, T)
    # +1 shift (reference util.py:57)
    np.testing.assert_array_equal(ts[:4], [1, 21, 41, 61])
    assert ts[-1] == 981 and ts.shape == (50,)


def test_ddim_timesteps_quad():
    ts = make_ddim_timesteps("quad", 20, T)
    np.testing.assert_array_equal(
        ts, [1, 3, 9, 20, 36, 56, 80, 109, 142, 180, 222, 269, 320, 375, 435,
             499, 568, 641, 719, 801])


def test_ddim_sampling_parameters_golden():
    sched = DiffusionSchedule.create("linear", T, START, END)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps("uniform", 50, T)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, eta=1.0)
    np.testing.assert_allclose(alphas[[0, 1, 49]],
                               [9.96994153e-01, 9.65668442e-01, 1.40045946e-04], rtol=1e-5)
    np.testing.assert_allclose(alphas_prev[[0, 1, 49]],
                               [9.98500000e-01, 9.96994153e-01, 2.08430054e-04], rtol=1e-5)
    np.testing.assert_allclose(sigmas[[0, 1, 49]],
                               [0.02743334, 0.05244944, 0.57277304], rtol=1e-5)
    # eta=0 (the shipped predict config) gives deterministic DDIM
    sig0, _, _ = make_ddim_sampling_parameters(ac, ts, eta=0.0)
    assert np.all(sig0 == 0.0)


def test_q_sample_identity():
    import jax.numpy as jnp

    sched = DiffusionSchedule.create("linear", T, START, END)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999], dtype=jnp.int32)
    xt = sched.q_sample(x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(xt[0, 0, 0, 0]), np.sqrt(0.9985), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(xt[1, 0, 0, 0]), np.sqrt(9.69108668e-05), rtol=1e-4)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_beta_schedule("nope", 10)
