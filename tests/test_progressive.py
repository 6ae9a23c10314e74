"""p_sample_loop / progressive_denoising surface (reference ddpm.py:1112-1217)."""

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.core.diffusion import (ddpm_sample, p_sample_loop,
                                      progressive_denoising)
from stedm_tpu.core.schedules import DiffusionSchedule


def _schedule(T=10):
    return DiffusionSchedule.create("linear", T, 0.0015, 0.0205)


def _eps_fn(x, t):
    return 0.1 * x + 0.01 * t[:, None, None, None].astype(jnp.float32)


def test_p_sample_loop_matches_ddpm_sample():
    # with defaults (no mask, temperature 1) the key sequence and math are the
    # same scan as ddpm_sample — final states must be bit-identical
    sched = _schedule()
    x_T = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)),
                      jnp.float32)
    rng = jax.random.PRNGKey(7)
    a = np.asarray(ddpm_sample(_eps_fn, sched, x_T, rng, clip_denoised=True))
    b = np.asarray(p_sample_loop(_eps_fn, sched, x_T, rng, clip_denoised=True,
                                 log_every_t=3))
    np.testing.assert_array_equal(a, b)


def test_intermediates_follow_reference_counting():
    # reference records when i % log_every_t == 0 or i == T-1 (ddpm.py:1211);
    # T=10, log_every_t=3 -> snapshots at i = 9, 6, 3, 0; p_sample_loop
    # prepends x_T (ddpm.py:1185 `intermediates = [img]`)
    sched = _schedule(T=10)
    x_T = jnp.zeros((1, 4, 4, 3))
    rng = jax.random.PRNGKey(0)
    x, inter = p_sample_loop(_eps_fn, sched, x_T, rng, log_every_t=3,
                             return_intermediates=True)
    assert inter.shape == (5, 1, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(inter[0]), np.asarray(x_T))
    np.testing.assert_array_equal(np.asarray(inter[-1]), np.asarray(x))

    # progressive: same snapshot steps, x0 estimates, no initial-noise entry
    x2, partials = progressive_denoising(_eps_fn, sched, x_T, rng,
                                         log_every_t=3)
    assert partials.shape == (4, 1, 4, 4, 3)
    # x0 estimates are clipped (clip_denoised=True default)
    assert float(jnp.abs(partials).max()) <= 1.0


def test_start_T_truncates():
    sched = _schedule(T=10)
    x_T = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 4, 3)),
                      jnp.float32)
    rng = jax.random.PRNGKey(1)
    _, inter = p_sample_loop(_eps_fn, sched, x_T, rng, start_T=5,
                             log_every_t=2, return_intermediates=True)
    # steps i = 4..0, snapshots at 4, 2, 0 -> 1 + 3 entries
    assert inter.shape[0] == 4


def test_mask_inpainting_keeps_known_region():
    # masked (known) region must equal the re-noised original at each step; at
    # the final step t=0 q_sample returns ~x0 so the region converges to x0
    sched = _schedule(T=10)
    rng = jax.random.PRNGKey(2)
    x0 = jnp.ones((1, 4, 4, 3)) * 0.5
    mask = jnp.zeros((1, 4, 4, 3)).at[:, :2].set(1.0)
    x_T = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 4, 3)),
                      jnp.float32)
    out = p_sample_loop(_eps_fn, sched, x_T, rng, mask=mask, x0=x0)
    got = np.asarray(out)[0, :2]
    # reproduce the final step's (t=0) inpaint noise key: last of the T split
    # keys, fold_in(..., 1) — the loop's documented key discipline
    last_key = jax.random.split(rng, 10)[-1]
    noise = jax.random.normal(jax.random.fold_in(last_key, 1), x0.shape,
                              dtype=jnp.float32)
    want = np.asarray(sched.q_sample(x0, jnp.zeros((1,), jnp.int32),
                                     noise))[0, :2]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_temperature_zero_is_deterministic():
    sched = _schedule(T=10)
    x_T = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 4, 3)),
                      jnp.float32)
    a = p_sample_loop(_eps_fn, sched, x_T, jax.random.PRNGKey(0),
                      temperature=0.0)
    b = p_sample_loop(_eps_fn, sched, x_T, jax.random.PRNGKey(9),
                      temperature=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
