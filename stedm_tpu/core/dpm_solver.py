"""DPM-Solver++(2M) sampler as a `lax.scan`.

Counterpart of the reference's bundled DPM-Solver library (reference
`ldm/models/diffusion/dpm_solver/` — dead on its active path, SURVEY.md §2.4).
Implements the multistep second-order data-prediction solver from "DPM-Solver++:
Fast Solver for Guided Sampling of Diffusion Probabilistic Models" (Lu et al. 2022)
on the discrete VP schedule:

    lambda_t = log(alpha_t / sigma_t),  x0_pred = (x - sigma_t * eps) / alpha_t
    x_{t-1} = (sigma_{t-1}/sigma_t) x - alpha_{t-1} (e^{-h} - 1) D,
    D = (1 + 1/(2 r)) x0_t - (1/(2 r)) x0_{t-1}   (first step: D = x0_t)

Same ``eps_fn`` contract as :func:`stedm_tpu.core.ddim.ddim_sample`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.core.ddim import rescaled_cfg
from stedm_tpu.core.schedules import DiffusionSchedule


def dpm_solver_pp_sample(eps_fn: Callable, x_T: jnp.ndarray,
                         schedule: DiffusionSchedule, num_steps: int, *,
                         cfg_scale: float = 1.0,
                         rescale_phi: float = 0.7) -> jnp.ndarray:
    use_cfg = cfg_scale != 1.0
    batch = x_T.shape[0]
    T = schedule.num_timesteps

    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    # time grid from T-1 down to 0, uniform in t (num_steps+1 points)
    t_grid = np.linspace(T - 1, 0, num_steps + 1).round().astype(np.int64)
    alpha = np.sqrt(ac[t_grid])
    sigma = np.sqrt(1.0 - ac[t_grid])
    lam = np.log(alpha) - np.log(sigma)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    ts = jnp.asarray(t_grid[:-1], jnp.int32)          # where the model is evaluated
    alphas, sigmas, lams = f32(alpha), f32(sigma), f32(lam)

    def eval_x0(x, step_t, a_t, s_t):
        tb = jnp.full((batch,), step_t, dtype=jnp.int32)
        out = eps_fn(x, tb)
        if use_cfg:
            e = rescaled_cfg(out[0], out[1], cfg_scale, rescale_phi)
        else:
            e = out[0] if isinstance(out, tuple) else out
        return (x - s_t * e.astype(jnp.float32)) / a_t

    def body(carry, i):
        x, x0_prev, h_prev, have_prev = carry
        a_t, s_t = alphas[i], sigmas[i]
        a_n, s_n = alphas[i + 1], sigmas[i + 1]
        h = lams[i + 1] - lams[i]

        x0 = eval_x0(x, ts[i], a_t, s_t)
        r = h_prev / h
        d_multi = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        d = jnp.where(have_prev, d_multi, x0)
        x_next = (s_n / s_t) * x - a_n * jnp.expm1(-h) * d
        return (x_next, x0, h, jnp.asarray(True)), ()

    init = (x_T.astype(jnp.float32), jnp.zeros_like(x_T, jnp.float32),
            jnp.asarray(1.0, jnp.float32), jnp.asarray(False))
    (x_0, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(num_steps))
    return x_0
