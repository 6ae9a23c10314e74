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


def _ancestral_with_snapshots(eps_fn: Callable, schedule: DiffusionSchedule,
                              x_T: jnp.ndarray, rng: jax.Array, *,
                              record: str, clip_denoised: bool,
                              log_every_t: int, temperature: float,
                              noise_dropout: float,
                              mask: jnp.ndarray | None, x0: jnp.ndarray | None,
                              start_T: int | None,
                              x0_postprocess: Callable | None
                              ) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Shared core of :func:`p_sample_loop` / :func:`progressive_denoising`.

    The reference records a snapshot whenever ``i % log_every_t == 0 or
    i == timesteps - 1`` (ddpm.py:1162-1163, 1211-1212). Rather than emitting
    every step from one scan (a [T, ...] HBM buffer), the trajectory is split
    into segments *ending* at snapshot steps and each segment is its own
    `lax.scan` — only the recorded states are ever materialized. With mask/
    temperature defaults and no snapshots consumed, the per-step math (and key
    sequence) is identical to :func:`ddpm_sample`."""
    T = schedule.num_timesteps
    T_eff = min(T, start_T) if start_T is not None else T
    batch = x_T.shape[0]
    keys = jax.random.split(rng, T_eff)

    def body(x, per_step):
        t_scalar, key = per_step
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        eps = eps_fn(x, t)
        x0_est = predict_start_from_noise(schedule, x, t, eps)
        if clip_denoised:
            x0_est = jnp.clip(x0_est, -1.0, 1.0)
        if x0_postprocess is not None:
            # the reference's quantize_denoised hook (ddpm.py:1085-1086)
            x0_est = x0_postprocess(x0_est)
        mean, log_var = q_posterior(schedule, x0_est, x, t)
        noise = jax.random.normal(key, x.shape, dtype=jnp.float32) * temperature
        if noise_dropout > 0.0:
            # torch F.dropout semantics (ddpm.py:1090): zero with prob p,
            # survivors scaled by 1/(1-p)
            keep = jax.random.bernoulli(jax.random.fold_in(key, 2),
                                        1.0 - noise_dropout, noise.shape)
            noise = noise * keep / (1.0 - noise_dropout)
        nonzero = (t_scalar > 0).astype(jnp.float32)
        x_prev = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        if mask is not None:
            # inpainting: re-noise the known region to level t (ddpm.py:1206-1208)
            orig = schedule.q_sample(
                x0, t, jax.random.normal(jax.random.fold_in(key, 1), x.shape,
                                         dtype=jnp.float32))
            x_prev = orig * mask + (1.0 - mask) * x_prev
        return x_prev, x0_est

    # segment the descending step list so each segment ends on a snapshot
    segments: list[list[int]] = []
    current: list[int] = []
    for i in range(T_eff - 1, -1, -1):
        current.append(i)
        if i % log_every_t == 0 or i == T_eff - 1:
            segments.append(current)
            current = []
    if current:  # only when 0 % log_every_t != 0 — impossible, but keep honest
        segments.append(current)

    x = x_T.astype(jnp.float32)
    snapshots: list[jnp.ndarray] = []
    pos = 0
    for seg in segments:
        seg_ts = jnp.asarray(seg, dtype=jnp.int32)
        seg_keys = keys[pos:pos + len(seg)]
        pos += len(seg)
        x, x0_seg = jax.lax.scan(body, x, (seg_ts, seg_keys))
        snapshots.append(x if record == "img" else x0_seg[-1])
    return x, snapshots


def p_sample_loop(eps_fn: Callable, schedule: DiffusionSchedule,
                  x_T: jnp.ndarray, rng: jax.Array, *,
                  clip_denoised: bool = True, return_intermediates: bool = False,
                  log_every_t: int = 100, temperature: float = 1.0,
                  noise_dropout: float = 0.0, mask: jnp.ndarray | None = None,
                  x0: jnp.ndarray | None = None, start_T: int | None = None,
                  x0_postprocess: Callable | None = None):
    """Ancestral sampling with the reference's full option surface
    (`LatentDiffusion.p_sample_loop`, ddpm.py:1169-1217): intermediates every
    ``log_every_t`` steps (including the initial noise and the first/final
    steps), inpainting ``mask``/``x0``, ``start_T`` truncation. Returns ``x``
    or ``(x, intermediates)`` with intermediates stacked on a leading axis."""
    x, snaps = _ancestral_with_snapshots(
        eps_fn, schedule, x_T, rng, record="img", clip_denoised=clip_denoised,
        log_every_t=log_every_t, temperature=temperature,
        noise_dropout=noise_dropout, mask=mask, x0=x0, start_T=start_T,
        x0_postprocess=x0_postprocess)
    if not return_intermediates:
        return x
    return x, jnp.stack([x_T.astype(jnp.float32)] + snaps)


def progressive_denoising(eps_fn: Callable, schedule: DiffusionSchedule,
                          x_T: jnp.ndarray, rng: jax.Array, *,
                          clip_denoised: bool = True, log_every_t: int = 200,
                          temperature: float = 1.0, noise_dropout: float = 0.0,
                          mask: jnp.ndarray | None = None,
                          x0: jnp.ndarray | None = None,
                          start_T: int | None = None,
                          x0_postprocess: Callable | None = None
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's `progressive_denoising` (ddpm.py:1112-1167): like
    :func:`p_sample_loop` but the recorded intermediates are the **x0
    estimates** (`return_x0=True` snapshots), not the noisy states; no initial
    -noise entry. Returns ``(x, x0_partials)``."""
    x, snaps = _ancestral_with_snapshots(
        eps_fn, schedule, x_T, rng, record="x0", clip_denoised=clip_denoised,
        log_every_t=log_every_t, temperature=temperature,
        noise_dropout=noise_dropout, mask=mask, x0=x0, start_T=start_T,
        x0_postprocess=x0_postprocess)
    return x, jnp.stack(snaps)
