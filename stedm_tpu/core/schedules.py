"""Diffusion noise schedules and DDIM parameter selection.

Numerics follow the reference exactly (reference
`ldm/modules/diffusionmodules/util.py:21-74` and `ldm/models/diffusion/ddpm.py:120-172`):
schedules are computed in float64 on the host, then frozen into a
:class:`DiffusionSchedule` of float32 device constants. On TPU these buffers are tiny
(1000 floats each) and are baked into the jitted computation as constants.

The active configuration (configs/diffusion/ldm_based.yaml) is
``linear(0.0015, 0.0205, 1000)``, where "linear" means *linear in sqrt space*:
``betas = linspace(sqrt(start), sqrt(end), T) ** 2``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(schedule: str, n_timestep: int, linear_start: float = 1e-4,
                       linear_end: float = 2e-2, cosine_s: float = 8e-3) -> np.ndarray:
    """Beta schedule in float64 (reference diffusionmodules/util.py:21-43)."""
    if schedule == "linear":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                            dtype=np.float64) ** 2
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(ddim_discr_method: str, num_ddim_timesteps: int,
                        num_ddpm_timesteps: int) -> np.ndarray:
    """Subset of DDPM timesteps used by DDIM (reference util.py:46-60).

    The +1 shift reproduces the reference's "final alpha values right" adjustment.
    """
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.arange(0, num_ddpm_timesteps, c)
    elif ddim_discr_method == "quad":
        ddim_timesteps = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8),
                                      num_ddim_timesteps) ** 2).astype(int)
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{ddim_discr_method}"')
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(alphacums: np.ndarray, ddim_timesteps: np.ndarray,
                                  eta: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-DDIM-step (sigma, alpha, alpha_prev) triplets (reference util.py:63-74)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([alphacums[:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM buffers (reference ddpm.py:120-172, `register_schedule`).

    All fields are float32 jnp arrays of shape [T] (scalars noted). ``lvlb_weights``
    has its t=0 entry overwritten by the t=1 entry like the reference (ddpm.py:171).
    """

    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray

    @classmethod
    def create(cls, beta_schedule: str = "linear", timesteps: int = 1000,
               linear_start: float = 1e-4, linear_end: float = 2e-2,
               cosine_s: float = 8e-3, given_betas: np.ndarray | None = None,
               v_posterior: float = 0.0,
               parameterization: str = "eps") -> "DiffusionSchedule":
        betas = np.asarray(given_betas, dtype=np.float64) if given_betas is not None \
            else make_beta_schedule(beta_schedule, timesteps, linear_start=linear_start,
                                    linear_end=linear_end, cosine_s=cosine_s)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        (t,) = betas.shape

        posterior_variance = ((1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev)
                              / (1.0 - alphas_cumprod) + v_posterior * betas)

        if parameterization == "eps":
            # posterior_variance[0] == 0 makes lvlb[0] inf; it is overwritten below
            # (the reference does the same, ddpm.py:163-171)
            with np.errstate(divide="ignore"):
                lvlb = betas ** 2 / (2 * posterior_variance * alphas * (1 - alphas_cumprod))
        elif parameterization == "x0":
            lvlb = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        else:
            raise NotImplementedError(f"parameterization {parameterization}")
        lvlb[0] = lvlb[1]

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            num_timesteps=int(t),
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
            lvlb_weights=f32(lvlb),
        )

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        """Forward-process sample x_t ~ q(x_t | x_0) (reference ddpm.py:277-280).

        ``t`` is an int array of shape [B]; gathered coefficients broadcast over the
        trailing (H, W, C) axes.
        """
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        a = self.sqrt_alphas_cumprod[t].reshape(shape)
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
        return a * x_start.astype(jnp.float32) + s * noise
