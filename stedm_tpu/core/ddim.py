"""DDIM sampling as a single `lax.scan`, TPU-native.

The reference's sampler is a python loop over steps with **two** full U-Net forwards
per step for classifier-free guidance (reference `ldm/models/diffusion/ddim.py:112-210`;
the batched variant was left commented out at `ddim.py:173-176`). Here the whole
trajectory is one scanned, jitted program, and the model wrapper batches cond+uncond
into a single call (see `stedm_tpu/models/stedm.py`) — the sampler itself only sees an
``eps_fn``.

Guidance uses the reference's *rescaled* CFG (ddim.py:179-184): the guided noise is
renormalized to the conditional branch's standard deviation computed over the
(channel, height) axes with Bessel's correction — exactly the torch
``std(dim=(1,2))`` over NCHW — then blended with ``rescale_phi``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.core.schedules import (
    DiffusionSchedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)


@dataclasses.dataclass(frozen=True)
class DDIMParams:
    """Per-step DDIM constants, index 0 = lowest-noise step (reference ddim.py:24-53)."""

    timesteps: jnp.ndarray               # [S] int32 DDPM timestep fed to the model
    alphas: jnp.ndarray                  # [S] alpha_cumprod at each step
    alphas_prev: jnp.ndarray             # [S]
    sigmas: jnp.ndarray                  # [S]
    sqrt_one_minus_alphas: jnp.ndarray   # [S]

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_steps: int, eta: float = 0.0,
               method: str = "uniform") -> "DDIMParams":
        ddim_ts = make_ddim_timesteps(method, num_steps, schedule.num_timesteps)
        alphacums = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(alphacums, ddim_ts, eta)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(ddim_ts, dtype=jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sigmas=f32(sigmas),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        )

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def rescaled_cfg(e_t: jnp.ndarray, e_t_uncond: jnp.ndarray, scale: float,
                 rescale_phi: float = 0.7) -> jnp.ndarray:
    """Rescaled classifier-free guidance (reference ddim.py:179-184).

    Inputs are NHWC; the reference computes torch ``std(dim=(1,2))`` on NCHW —
    i.e. over the (channel, height) axes with Bessel's correction — which maps to
    axes (1, 3) here.
    """
    e_t = e_t.astype(jnp.float32)
    e_t_uncond = e_t_uncond.astype(jnp.float32)
    e_t_w = e_t_uncond + scale * (e_t - e_t_uncond)
    axes = (1, 3)
    std_c = jnp.std(e_t, axis=axes, keepdims=True, ddof=1)
    std_w = jnp.std(e_t_w, axis=axes, keepdims=True, ddof=1)
    rescaled = e_t_w * (std_c / std_w)
    return rescaled * rescale_phi + (1.0 - rescale_phi) * e_t


def ddim_step(x: jnp.ndarray, e_t: jnp.ndarray, a_t: jnp.ndarray, a_prev: jnp.ndarray,
              sigma_t: jnp.ndarray, sqrt_one_minus_at: jnp.ndarray,
              noise: jnp.ndarray | None = None,
              temperature: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM update x_t -> x_{t-1} (reference ddim.py:200-210)."""
    x = x.astype(jnp.float32)
    e_t = e_t.astype(jnp.float32)
    pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t ** 2) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    if noise is not None:
        x_prev = x_prev + sigma_t * noise * temperature
    return x_prev, pred_x0


def ddim_sample(eps_fn: Callable, x_T: jnp.ndarray, params: DDIMParams, *,
                cfg_scale: float = 1.0, rescale_phi: float = 0.7,
                rng: jax.Array | None = None,
                temperature: float = 1.0) -> jnp.ndarray:
    """Run the full DDIM trajectory as one `lax.scan` (reference ddim.py:112-162).

    ``eps_fn(x, t)`` returns the model's eps prediction for a [B, H, W, C] latent and
    a [B] int32 timestep batch. When ``cfg_scale != 1`` it must instead return the
    pair ``(e_t_cond, e_t_uncond)`` — how the two branches are evaluated (one batched
    call vs. two calls) is the model wrapper's choice.

    ``rng`` is only needed for eta > 0 (the active config uses eta = 0, see
    configs/config_predict.yaml).
    """
    use_cfg = cfg_scale != 1.0
    steps = params.num_steps
    batch = x_T.shape[0]

    if rng is not None:
        step_keys = jax.random.split(rng, steps)
    else:
        step_keys = jnp.zeros((steps, 2), dtype=jnp.uint32)
    stochastic = rng is not None

    # scan runs from the highest-noise step (index S-1) down to index 0
    order = jnp.arange(steps - 1, -1, -1)
    xs = (
        params.timesteps[order],
        params.alphas[order],
        params.alphas_prev[order],
        params.sigmas[order],
        params.sqrt_one_minus_alphas[order],
        step_keys,
    )

    def body(x, per_step):
        step_t, a_t, a_prev, sigma_t, sq1m, key = per_step
        ts = jnp.full((batch,), step_t, dtype=jnp.int32)
        out = eps_fn(x, ts)
        if use_cfg:
            e_t = rescaled_cfg(out[0], out[1], cfg_scale, rescale_phi)
        else:
            e_t = out[0] if isinstance(out, tuple) else out
        noise = jax.random.normal(key, x.shape, dtype=jnp.float32) if stochastic else None
        x_prev, _ = ddim_step(x, e_t, a_t, a_prev, sigma_t, sq1m,
                              noise=noise, temperature=temperature)
        return x_prev, ()

    x_0, _ = jax.lax.scan(body, x_T.astype(jnp.float32), xs)
    return x_0


def guided_range(num_steps: int, cfg_interval) -> tuple[int, int]:
    """Resolve a (lo_frac, hi_frac) guidance interval to scan positions.

    Positions are scan order (0 = highest-noise step); guidance applies on
    steps ``lo <= k < hi``. ``None`` (or full coverage) means every step is
    guided — the caller should treat that as "no interval" to keep the
    unrestricted program bit-identical.
    """
    if cfg_interval is None:
        return 0, num_steps
    lo_f, hi_f = float(cfg_interval[0]), float(cfg_interval[1])
    if not 0.0 <= lo_f <= hi_f <= 1.0:
        raise ValueError(f"cfg_interval must satisfy 0 <= lo <= hi <= 1, "
                         f"got {cfg_interval}")
    lo = int(round(lo_f * num_steps))
    hi = int(round(hi_f * num_steps))
    return max(0, min(lo, num_steps)), max(lo, min(hi, num_steps))


def ddim_sample_guided(eps_fn: Callable, eps_cond_fn: Callable, x_T: jnp.ndarray,
                       params: DDIMParams, *, guided_lo: int, guided_hi: int,
                       cfg_scale: float, rescale_phi: float = 0.7,
                       rng: jax.Array | None = None,
                       temperature: float = 1.0) -> jnp.ndarray:
    """Exact DDIM with classifier-free guidance restricted to an interval.

    Serving-mode FLOP lever with no reference counterpart (the reference
    guides every step, reference ddim.py:177-184): guidance is applied only on
    scan positions ``[guided_lo, guided_hi)`` — "Applying Guidance in a
    Limited Interval Improves Sample and Distribution Quality" (Kynkäänniemi
    et al. 2024, arXiv 2404.07724). Outside the interval only the conditional
    branch evaluates (``eps_cond_fn(x, t) -> eps``), skipping the uncond half
    of the fan-out. The trajectory is three chained `lax.scan` segments so
    each segment's program has a static shape; the per-step key sequence is
    shared with `ddim_sample` (key k = scan position k), so full coverage is
    bit-identical to the unrestricted sampler.
    """
    steps = params.num_steps
    batch = x_T.shape[0]
    stochastic = rng is not None
    step_keys = (jax.random.split(rng, steps) if stochastic
                 else jnp.zeros((steps, 2), dtype=jnp.uint32))

    order = jnp.arange(steps - 1, -1, -1)
    consts = (params.timesteps[order], params.alphas[order],
              params.alphas_prev[order], params.sigmas[order],
              params.sqrt_one_minus_alphas[order], step_keys)

    def seg(x, lo, hi, guided):
        if hi <= lo:
            return x
        xs = tuple(c[lo:hi] for c in consts)

        def body(x, per_step):
            step_t, a_t, a_prev, sigma_t, sq1m, key = per_step
            ts = jnp.full((batch,), step_t, dtype=jnp.int32)
            if guided:
                out = eps_fn(x, ts)
                e_t = rescaled_cfg(out[0], out[1], cfg_scale, rescale_phi)
            else:
                e_t = eps_cond_fn(x, ts).astype(jnp.float32)
            noise = (jax.random.normal(key, x.shape, dtype=jnp.float32)
                     if stochastic else None)
            return ddim_step(x, e_t, a_t, a_prev, sigma_t, sq1m, noise=noise,
                             temperature=temperature)[0], ()

        return jax.lax.scan(body, x, xs)[0]

    x = x_T.astype(jnp.float32)
    x = seg(x, 0, guided_lo, False)
    x = seg(x, guided_lo, guided_hi, True)
    return seg(x, guided_hi, steps, False)


def ddim_sample_scheduled(eps_full_fn: Callable, eps_cached_fn: Callable,
                          x_T: jnp.ndarray, params: DDIMParams, *,
                          refresh_positions, cfg_scale: float = 1.0,
                          rescale_phi: float = 0.7, rng: jax.Array | None = None,
                          temperature: float = 1.0) -> jnp.ndarray:
    """DDIM with deep-feature reuse on an ARBITRARY refresh schedule.

    The non-uniform twin of `ddim_sample_cached`: ``refresh_positions`` (scan
    order, 0 = highest-noise step, must include 0 — see
    `stedm_tpu.core.cache_schedule`) names the steps that re-evaluate the full
    model via ``eps_full_fn``; every other step runs ``eps_cached_fn`` against
    the most recent cache. Step 0 runs outside the scan (it materializes the
    cache pytree); the rest is one `lax.scan` whose body switches on a per-step
    refresh flag with `lax.cond`, so only the selected branch executes at
    runtime and the program stays a single static trace for any schedule.

    With ``refresh_positions = range(0, S, N)`` the trajectory equals
    `ddim_sample_cached(cache_interval=N)`; with ``range(S)`` it equals
    `ddim_sample`.
    """
    from stedm_tpu.core.cache_schedule import validate_positions

    use_cfg = cfg_scale != 1.0
    steps = params.num_steps
    batch = x_T.shape[0]
    refresh = np.zeros(steps, bool)
    refresh[list(validate_positions(refresh_positions, steps))] = True

    if rng is not None:
        step_keys = jax.random.split(rng, steps)
    else:
        step_keys = jnp.zeros((steps, 2), dtype=jnp.uint32)
    stochastic = rng is not None

    order = jnp.arange(steps - 1, -1, -1)
    consts = (params.timesteps[order], params.alphas[order],
              params.alphas_prev[order], params.sigmas[order],
              params.sqrt_one_minus_alphas[order])

    def update(x, out, a_t, a_prev, sigma_t, sq1m, key):
        if use_cfg:
            e_t = rescaled_cfg(out[0], out[1], cfg_scale, rescale_phi)
        else:
            e_t = out[0] if isinstance(out, tuple) else out
        noise = (jax.random.normal(key, x.shape, dtype=jnp.float32)
                 if stochastic else None)
        return ddim_step(x, e_t, a_t, a_prev, sigma_t, sq1m,
                         noise=noise, temperature=temperature)[0]

    # step 0 (always a refresh) materializes the cache pytree for the scan carry
    x = x_T.astype(jnp.float32)
    ts0 = jnp.full((batch,), consts[0][0], dtype=jnp.int32)
    out0, cache = eps_full_fn(x, ts0)
    x = update(x, out0, consts[1][0], consts[2][0], consts[3][0], consts[4][0],
               step_keys[0])
    if steps == 1:
        return x

    xs = tuple(c[1:] for c in consts) + (
        step_keys[1:], jnp.asarray(refresh[1:]))

    def body(carry, per_step):
        x, cache = carry
        step_t, a_t, a_prev, sigma_t, sq1m, key, is_refresh = per_step
        ts = jnp.full((batch,), step_t, dtype=jnp.int32)

        def full_branch(x, ts, cache):
            out, new_cache = eps_full_fn(x, ts)
            return out, new_cache

        def cached_branch(x, ts, cache):
            return eps_cached_fn(x, ts, cache), cache

        out, cache = jax.lax.cond(is_refresh, full_branch, cached_branch,
                                  x, ts, cache)
        x = update(x, out, a_t, a_prev, sigma_t, sq1m, key)
        return (x, cache), ()

    (x_0, _), _ = jax.lax.scan(body, (x, cache), xs)
    return x_0


def ddim_sample_scheduled_guided(eps_full_fn: Callable, eps_cached_fn: Callable,
                                 eps_full_cond_fn: Callable,
                                 eps_cached_cond_fn: Callable,
                                 x_T: jnp.ndarray, params: DDIMParams, *,
                                 refresh_positions, guided_lo: int,
                                 guided_hi: int, cfg_scale: float,
                                 rescale_phi: float = 0.7,
                                 rng: jax.Array | None = None,
                                 temperature: float = 1.0) -> jnp.ndarray:
    """Scheduled deep-feature reuse COMPOSED with a guidance interval — the
    scanned twin of the host-block drive's combined serving mode.

    Guidance applies on scan positions ``[guided_lo, guided_hi)``
    (`ddim_sample_guided`); the trunk cache refreshes on ``refresh_positions``
    (`ddim_sample_scheduled`). Guided steps use ``eps_full_fn``/``eps_cached_fn``
    (2B cond/uncond fan-out); unguided steps use the ``*_cond_fn`` twins at
    batch B. The trajectory runs as up to three segment scans with static
    shapes: the guidance entry step is forced to refresh (so guided shallow
    steps always see a fan-out cache), and on exit the cache's cond rows are
    sliced once at the segment boundary. Equal to the host-block combined mode
    (tests/test_cfg_interval.py) and, at full coverage, to
    `ddim_sample_scheduled`.
    """
    from stedm_tpu.core.cache_schedule import validate_positions

    steps = params.num_steps
    batch = x_T.shape[0]
    glo, ghi = int(guided_lo), int(guided_hi)
    pos = set(validate_positions(refresh_positions, steps))
    if ghi > glo and glo < steps:
        pos.add(glo)          # same forced refresh as the host drive
    refresh = np.zeros(steps, bool)
    refresh[sorted(pos)] = True

    stochastic = rng is not None
    step_keys = (jax.random.split(rng, steps) if stochastic
                 else jnp.zeros((steps, 2), dtype=jnp.uint32))
    order = jnp.arange(steps - 1, -1, -1)
    consts = (params.timesteps[order], params.alphas[order],
              params.alphas_prev[order], params.sigmas[order],
              params.sqrt_one_minus_alphas[order], step_keys)

    def update(x, out, a_t, a_prev, sigma_t, sq1m, key, g):
        if g:
            e_t = rescaled_cfg(out[0], out[1], cfg_scale, rescale_phi)
        else:
            e_t = out.astype(jnp.float32)
        noise = (jax.random.normal(key, x.shape, dtype=jnp.float32)
                 if stochastic else None)
        return ddim_step(x, e_t, a_t, a_prev, sigma_t, sq1m, noise=noise,
                         temperature=temperature)[0]

    def run_segment(x, cache, lo, hi, g):
        """Scan steps [lo, hi) with static guidance g; `cache` is the carry
        entering the segment (None only when refresh[lo])."""
        if hi <= lo:
            return x, cache
        full = eps_full_fn if g else eps_full_cond_fn
        shal = eps_cached_fn if g else eps_cached_cond_fn
        i = lo
        if cache is None:
            # materialize the carry pytree at the segment's leading refresh
            assert refresh[lo], (lo, "segment must start on a refresh when no "
                                     "carry cache enters it")
            ts0 = jnp.full((batch,), consts[0][lo], dtype=jnp.int32)
            out, cache = full(x, ts0)
            x = update(x, out, consts[1][lo], consts[2][lo], consts[3][lo],
                       consts[4][lo], step_keys[lo], g)
            i = lo + 1
        if i >= hi:
            return x, cache
        xs = tuple(c[i:hi] for c in consts) + (jnp.asarray(refresh[i:hi]),)

        def body(carry, per_step):
            x, cache = carry
            step_t, a_t, a_prev, sigma_t, sq1m, key, is_refresh = per_step
            ts = jnp.full((batch,), step_t, dtype=jnp.int32)

            def full_branch(x, ts, cache):
                return full(x, ts)

            def cached_branch(x, ts, cache):
                return shal(x, ts, cache), cache

            out, cache = jax.lax.cond(is_refresh, full_branch, cached_branch,
                                      x, ts, cache)
            x = update(x, out, a_t, a_prev, sigma_t, sq1m, key, g)
            return (x, cache), ()

        (x, cache), _ = jax.lax.scan(body, (x, cache), xs)
        return x, cache

    x = x_T.astype(jnp.float32)
    if ghi <= glo or glo >= steps:          # empty guided window: one segment
        x, _ = run_segment(x, None, 0, steps, False)
        return x
    if glo > 0:
        x, _ = run_segment(x, None, 0, glo, False)
    # entering the guided window: position glo is a forced refresh, so the
    # guided segment materializes its own fan-out cache (no carry crosses in)
    x, cache = run_segment(x, None, glo, ghi, True)
    if ghi < steps:
        # exiting: unguided steps consume only the cond rows of the fan-out
        cache_b = jax.tree_util.tree_map(lambda a: a[:batch], cache)
        x, _ = run_segment(x, cache_b, ghi, steps, False)
    return x


def ddim_sample_cached(eps_full_fn: Callable, eps_cached_fn: Callable,
                       x_T: jnp.ndarray, params: DDIMParams, *,
                       cache_interval: int, cfg_scale: float = 1.0,
                       rescale_phi: float = 0.7, rng: jax.Array | None = None,
                       temperature: float = 1.0) -> jnp.ndarray:
    """DDIM trajectory with cross-step deep-feature reuse (DeepCache-style).

    The scan runs over blocks of ``cache_interval`` consecutive steps: the first
    step of each block evaluates the model fully via ``eps_full_fn(x, t) ->
    (eps, cache)`` and the remaining ``cache_interval - 1`` steps run the cheap
    shallow path ``eps_cached_fn(x, t, cache)``. With ``cache_interval == 1``
    every step is a full step and the trajectory is bit-identical to
    `ddim_sample`. Under CFG both fns return the ``(e_t_cond, e_t_uncond)`` pair
    (the cache carries the cond/uncond fan-out in its batch dim).

    When the step count is not a multiple of the interval, the last block is
    padded with masked no-op repeats of the final (lowest-noise) step.
    """
    use_cfg = cfg_scale != 1.0
    steps = params.num_steps
    interval = int(cache_interval)
    assert interval >= 1
    batch = x_T.shape[0]
    n_blocks = -(-steps // interval)
    pad = n_blocks * interval - steps

    if rng is not None:
        step_keys = jax.random.split(rng, steps)
    else:
        step_keys = jnp.zeros((steps, 2), dtype=jnp.uint32)
    stochastic = rng is not None

    # high-noise step first; pad the low-noise tail with masked repeats of step 0
    order = np.concatenate([np.arange(steps - 1, -1, -1), np.zeros(pad, np.int64)])
    valid = jnp.asarray(np.concatenate([np.ones(steps), np.zeros(pad)]), jnp.float32)
    blk = lambda a: a[order].reshape((n_blocks, interval) + a.shape[1:])
    # step keys are consumed in SCAN order (key 0 = highest-noise step), exactly
    # like `ddim_sample`, so interval-1 stays bit-identical even when stochastic;
    # padded entries reuse the last key but are masked out below
    keys_seq = jnp.concatenate(
        [step_keys, jnp.tile(step_keys[-1:], (pad, 1))]
    ).reshape((n_blocks, interval) + step_keys.shape[1:])
    xs = (
        blk(params.timesteps),
        blk(params.alphas),
        blk(params.alphas_prev),
        blk(params.sigmas),
        blk(params.sqrt_one_minus_alphas),
        keys_seq,
        valid.reshape(n_blocks, interval),
    )

    def body(x, per_block):
        ts_b, a_b, ap_b, sg_b, sq_b, keys_b, valid_b = per_block

        def update(x, out, j):
            if use_cfg:
                e_t = rescaled_cfg(out[0], out[1], cfg_scale, rescale_phi)
            else:
                e_t = out[0] if isinstance(out, tuple) else out
            noise = (jax.random.normal(keys_b[j], x.shape, dtype=jnp.float32)
                     if stochastic else None)
            x_prev, _ = ddim_step(x, e_t, a_b[j], ap_b[j], sg_b[j], sq_b[j],
                                  noise=noise, temperature=temperature)
            return jnp.where(valid_b[j] > 0, x_prev, x)

        ts = jnp.full((batch,), ts_b[0], dtype=jnp.int32)
        out, cache = eps_full_fn(x, ts)
        x = update(x, out, 0)
        for j in range(1, interval):  # unrolled shallow steps inside the scan body
            ts = jnp.full((batch,), ts_b[j], dtype=jnp.int32)
            x = update(x, eps_cached_fn(x, ts, cache), j)
        return x, ()

    x_0, _ = jax.lax.scan(body, x_T.astype(jnp.float32), xs)
    return x_0
