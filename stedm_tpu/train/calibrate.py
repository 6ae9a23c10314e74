"""Serving-mode calibration: measure the per-step drift of the cached trunk.

Runs ONE exact DDIM trajectory on the target checkpoint, evaluating the model
through the caching split (`model.eps_full`) at every step, and records how much
the deep-trunk output ("the cache") moves between consecutive steps. The
resulting drift profile feeds :func:`stedm_tpu.core.cache_schedule.optimal_positions`
to place the serving mode's trunk refreshes where they matter.

No reference counterpart (/root/reference runs two fresh full U-Net passes per
step, ddim.py:177-178); this calibrates a TPU-serving feature of this framework.

The trajectory math is identical to the exact sampler (`core.ddim.ddim_sample` /
the host-block twin): eps from the full evaluation, rescaled CFG, `ddim_step`.
One jitted per-step program, driven from the host (S dispatches, S scalar
readbacks) — cheap even through the remote tunnel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.core.ddim import DDIMParams, ddim_step, rescaled_cfg
from stedm_tpu.core.schedules import DiffusionSchedule
from stedm_tpu.models.stedm import STEDM
from stedm_tpu.train.steps import SamplerConfig


def measure_cache_drift(model: STEDM, schedule: DiffusionSchedule,
                        cfg: SamplerConfig, params, batch: dict,
                        rng: jax.Array) -> np.ndarray:
    """Per-step relative drift of the cached trunk along one exact trajectory.

    Returns ``drift`` of length ``cfg.ddim_steps - 1`` in scan order:
    ``drift[k]`` is the mean relative L1 movement of the trunk output between
    steps k and k+1 (0 = highest-noise step). ``cfg.cache_levels`` selects the
    same cache split the serving mode will use; ``cache_interval``/
    ``cache_schedule`` are ignored (this is the exact trajectory).
    """
    if cfg.method != "ddim":
        raise ValueError("calibration runs the DDIM trajectory only")
    ddim = DDIMParams.create(schedule, cfg.ddim_steps, cfg.eta)
    use_cfg = cfg.use_cfg and cfg.cfg_scale != 1.0
    bottleneck_only = (not model.unet_config.get("use_spatial_transformer", False)
                       and model.conditioning_key == "hybrid")
    if use_cfg and not (cfg.batched_cfg and bottleneck_only):
        raise ValueError("calibration (like the serving mode) requires "
                         "batched_cfg and bottleneck-only conditioning")
    scale = cfg.cfg_scale if use_cfg else 1.0
    stochastic = cfg.eta > 0

    var = {"params": {k: v for k, v in params.items() if k != "logvar"}}

    @jax.jit
    def prep(var, batch):
        seg_cond = model.apply(var, batch["segmentation"],
                               method=model.cond_encode)
        style_c = model.apply(var, batch["style_imgs"],
                              method=model.style_encode)
        if use_cfg:
            style_u = model.apply(var, jnp.zeros_like(batch["style_imgs"]) - 2.0,
                                  method=model.style_encode)
            return seg_cond, jnp.concatenate([style_c, style_u])
        return seg_cond, style_c

    def step_fn(var, x, ts, seg_cond, ctx, a_t, a_prev, sigma_t, sq1m, key):
        b = x.shape[0]
        out, cache = model.apply(var, x, ts, seg_cond, ctx, cfg.cache_levels,
                                 method=model.eps_full)
        if use_cfg:
            e_t = rescaled_cfg(out[:b], out[b:], scale, cfg.rescale_phi)
        else:
            e_t = out
        noise = (jax.random.normal(key, x.shape, dtype=jnp.float32)
                 if stochastic else None)
        x_prev, _ = ddim_step(x, e_t, a_t, a_prev, sigma_t, sq1m, noise=noise)
        return x_prev, cache

    step_jit = jax.jit(step_fn, donate_argnums=(1,))

    @jax.jit
    def rel_drift(ca, cb):
        num, den = 0.0, 0.0
        for a, b_ in zip(jax.tree_util.tree_leaves(ca),
                         jax.tree_util.tree_leaves(cb)):
            num += jnp.mean(jnp.abs(b_.astype(jnp.float32)
                                    - a.astype(jnp.float32)))
            den += jnp.mean(jnp.abs(a.astype(jnp.float32)))
        return num / (den + 1e-8)

    seg = batch["segmentation"]
    b, p = seg.shape[0], seg.shape[1]
    if p > model.patch_size:
        raise ValueError("calibration is patch-only (the serving mode does not "
                         "run on tiled canvases)")
    seg_cond, ctx = prep(var, batch)
    rng_steps = None
    if stochastic:
        rng, rng_steps = jax.random.split(rng)
    latent = (b, p // cfg.downsample, p // cfg.downsample, cfg.latent_channels)
    x = jax.random.normal(rng, latent, dtype=jnp.float32)
    step_keys = (jax.random.split(rng_steps, ddim.num_steps)
                 if stochastic else None)

    order = np.arange(ddim.num_steps - 1, -1, -1)
    consts = [np.asarray(a)[order] for a in
              (ddim.timesteps, ddim.alphas, ddim.alphas_prev, ddim.sigmas,
               ddim.sqrt_one_minus_alphas)]

    drifts = []
    prev_cache = None
    for k in range(ddim.num_steps):
        ts = jnp.full((b,), int(consts[0][k]), jnp.int32)
        key = step_keys[k] if stochastic else rng
        x, cache = step_jit(var, x, ts, seg_cond, ctx,
                            float(consts[1][k]), float(consts[2][k]),
                            float(consts[3][k]), float(consts[4][k]), key)
        if prev_cache is not None:
            drifts.append(float(rel_drift(prev_cache, cache)))
        prev_cache = cache
    return np.asarray(drifts, np.float64)
