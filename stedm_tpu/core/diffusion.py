"""Pure training-loss and ancestral-sampling math for latent diffusion.

These are the functional equivalents of the reference's `DDPM.p_losses` /
`LatentDiffusion.p_losses` (reference `ldm/models/diffusion/ddpm.py:282-324,1015-1048`)
and `p_sample_loop` (ddpm.py:255-268). Model application is injected as ``eps_fn`` so
the same math serves train (under `jax.grad`) and eval.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from stedm_tpu.core.schedules import DiffusionSchedule


def simple_loss(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "l1") -> jnp.ndarray:
    """Per-sample reconstruction loss, mean over all non-batch axes
    (reference ddpm.py:282-296 + the ``.mean([1, 2, 3])`` at ddpm.py:1031)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    axes = tuple(range(1, pred.ndim))
    if loss_type == "l1":
        return jnp.abs(target - pred).mean(axis=axes)
    if loss_type == "l2":
        return jnp.square(target - pred).mean(axis=axes)
    raise NotImplementedError(f"unknown loss type '{loss_type}'")


def p_losses(eps_fn: Callable, schedule: DiffusionSchedule, x_start: jnp.ndarray,
             t: jnp.ndarray, noise: jnp.ndarray, *, loss_type: str = "l1",
             parameterization: str = "eps", logvar: jnp.ndarray | None = None,
             l_simple_weight: float = 1.0, original_elbo_weight: float = 0.0
             ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Conditional denoising loss (reference ddpm.py:1015-1048).

    ``eps_fn(x_noisy, t)`` applies the conditioned model; conditioning is closed over
    by the caller. ``logvar`` is the per-timestep learned/static log-variance buffer
    (zeros in the shipped config, reference ddpm.py:113-117).
    """
    x_noisy = schedule.q_sample(x_start, t, noise)
    model_out = eps_fn(x_noisy, t)

    target = noise if parameterization == "eps" else x_start
    loss_per_sample = simple_loss(model_out, target, loss_type)

    loss_simple = loss_per_sample.mean()
    logvar_t = jnp.zeros_like(loss_per_sample) if logvar is None else logvar[t]
    loss = (loss_per_sample / jnp.exp(logvar_t) + logvar_t).mean() * l_simple_weight

    loss_vlb = (schedule.lvlb_weights[t] * loss_per_sample).mean()
    loss = loss + original_elbo_weight * loss_vlb

    return loss, {"loss_simple": loss_simple, "loss_vlb": loss_vlb, "loss": loss}


def predict_start_from_noise(schedule: DiffusionSchedule, x_t: jnp.ndarray,
                             t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """x0 estimate from eps (reference ddpm.py:219-223)."""
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    return (schedule.sqrt_recip_alphas_cumprod[t].reshape(shape) * x_t
            - schedule.sqrt_recipm1_alphas_cumprod[t].reshape(shape) * noise)


def q_posterior(schedule: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray,
                t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior q(x_{t-1} | x_t, x_0) mean and clipped log-variance
    (reference ddpm.py:225-233)."""
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    mean = (schedule.posterior_mean_coef1[t].reshape(shape) * x_start
            + schedule.posterior_mean_coef2[t].reshape(shape) * x_t)
    log_var = schedule.posterior_log_variance_clipped[t].reshape(shape)
    return mean, log_var


def ddpm_sample(eps_fn: Callable, schedule: DiffusionSchedule, x_T: jnp.ndarray,
                rng: jax.Array, *, clip_denoised: bool = False) -> jnp.ndarray:
    """Full-T ancestral sampling as a `lax.scan` (reference ddpm.py:235-268).

    This is the non-DDIM branch of `sample_log` (reference ddpm.py:1246-1248); the
    hot path is :func:`stedm_tpu.core.ddim.ddim_sample`.
    """
    T = schedule.num_timesteps
    batch = x_T.shape[0]
    keys = jax.random.split(rng, T)
    ts = jnp.arange(T - 1, -1, -1)

    def body(x, per_step):
        t_scalar, key = per_step
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        eps = eps_fn(x, t)
        x0 = predict_start_from_noise(schedule, x, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean, log_var = q_posterior(schedule, x0, x, t)
        noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
        nonzero = (t_scalar > 0).astype(jnp.float32)
        x_prev = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return x_prev, ()

    x_0, _ = jax.lax.scan(body, x_T.astype(jnp.float32), (ts, keys))
    return x_0
