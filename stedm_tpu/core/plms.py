"""PLMS (pseudo linear multistep) sampler as a `lax.scan`.

Counterpart of the reference's `PLMSSampler` (reference
`ldm/models/diffusion/plms.py` — present but dead on the reference's active path,
SURVEY.md §2.4 "Alt samplers"): DDIM's deterministic update driven by an
Adams-Bashforth combination of the last up-to-4 eps predictions. The first step
uses the reference's 2-evaluation trapezoid bootstrap (plms.py `p_sample_plms`):
eps at (x, t) and at the provisional x_prev with the *next* timestep, averaged.

Same ``eps_fn`` contract as :func:`stedm_tpu.core.ddim.ddim_sample`, including the
(cond, uncond) pair + rescaled CFG when ``cfg_scale != 1``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from stedm_tpu.core.ddim import DDIMParams, ddim_step, rescaled_cfg


def plms_sample(eps_fn: Callable, x_T: jnp.ndarray, params: DDIMParams, *,
                cfg_scale: float = 1.0, rescale_phi: float = 0.7) -> jnp.ndarray:
    use_cfg = cfg_scale != 1.0
    steps = params.num_steps
    batch = x_T.shape[0]

    def eval_eps(x, step_t):
        ts = jnp.full((batch,), step_t, dtype=jnp.int32)
        out = eps_fn(x, ts)
        if use_cfg:
            return rescaled_cfg(out[0], out[1], cfg_scale, rescale_phi)
        return out[0] if isinstance(out, tuple) else out

    order = jnp.arange(steps - 1, -1, -1)
    ts_seq = params.timesteps[order]
    # the "next" timestep for the trapezoid bootstrap (last step pairs with t=0)
    ts_next = jnp.concatenate([ts_seq[1:], jnp.zeros((1,), ts_seq.dtype)])

    def step_at(x, e_prime, idx):
        return ddim_step(x, e_prime, params.alphas[idx], params.alphas_prev[idx],
                         params.sigmas[idx], params.sqrt_one_minus_alphas[idx])[0]

    def body(carry, per_step):
        x, hist, n_hist = carry           # hist: [3, ...] newest-first
        i, step_t, step_t_next = per_step
        idx = i                            # index into the DDIM parameter tables
        e_t = eval_eps(x, step_t)

        def bootstrap(_):
            # 2nd-order trapezoid: evaluate at the provisional x_prev, t_next
            x_prev0 = step_at(x, e_t, idx)
            e_next = eval_eps(x_prev0, step_t_next)
            return (e_t + e_next) / 2.0

        def adams(_):
            e1 = (3.0 * e_t - hist[0]) / 2.0
            e2 = (23.0 * e_t - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0
            e3 = (55.0 * e_t - 59.0 * hist[0] + 37.0 * hist[1] - 9.0 * hist[2]) / 24.0
            return jnp.where(n_hist == 1, e1, jnp.where(n_hist == 2, e2, e3))

        e_prime = jax.lax.cond(n_hist == 0, bootstrap, adams, operand=None)
        x_prev = step_at(x, e_prime, idx)
        new_hist = jnp.stack([e_t, hist[0], hist[1]])
        return (x_prev, new_hist, jnp.minimum(n_hist + 1, 3)), ()

    hist0 = jnp.zeros((3,) + x_T.shape, jnp.float32)
    (x_0, _, _), _ = jax.lax.scan(
        body, (x_T.astype(jnp.float32), hist0, jnp.asarray(0)),
        (order, ts_seq, ts_next))
    return x_0
