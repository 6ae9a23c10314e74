"""Pure, jittable train and sample steps for the diffusion model.

These compose the composite model (`stedm_tpu/models/stedm.py`) with the schedule
math (`stedm_tpu/core/`) into the functions the entry points jit over the device
mesh. Reference call stacks being reproduced: the training step
(`SURVEY.md §3.1`: get_input -> q_sample -> U-Net -> L1 + EMA) and the predict step
(`§3.2`: conditioning -> DDIM loop with CFG -> VQ decode).

TPU-first details:
* cond/uncond CFG branches run as ONE batched U-Net call (the optimization the
  reference left commented out, reference ddim.py:173-176); a two-call parity mode
  is kept behind ``batched_cfg=False``.
* the DDIM loop is a `lax.scan` inside the jitted sampler — no host round-trips.
* under a data-sharded batch + replicated params, XLA inserts the gradient
  all-reduce over ICI (the DDP equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stedm_tpu.core.ddim import (DDIMParams, ddim_sample, ddim_sample_cached,
                                 guided_range)
from stedm_tpu.core.diffusion import p_losses
from stedm_tpu.core.schedules import DiffusionSchedule
from stedm_tpu.models.stedm import STEDM
from stedm_tpu.train.ema import ema_update


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any          # shadow of the denoiser (reference: LitEma over the
    ema_updates: jnp.ndarray  # DiffusionWrapper only, ddpm.py:91-94)


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # real copies, not aliases: the train step donates its input state and XLA
        # rejects the same buffer appearing twice
        ema_params=jax.tree_util.tree_map(jnp.copy, params["unet"]),
        ema_updates=jnp.zeros((), jnp.int32),
    )


def init_logvar(params: dict, num_timesteps: int, logvar_init: float = 0.0) -> dict:
    """Add the per-timestep log-variance buffer as a trainable top-level param
    group (reference ddpm.py:113-117 registers it; ldm_diffusion.py:228-229 adds it
    to the optimizer when ``learn_logvar``). The optimizer's label fn treats any
    non-frozen top-level group as trainable, so no optimizer change is needed."""
    return {**params, "logvar": jnp.full((num_timesteps,), logvar_init, jnp.float32)}


def compute_scale_by_std(model: STEDM, params, images: jnp.ndarray) -> float:
    """First-batch latent std rescale (reference ddpm.py:480-494): returns
    ``1 / std(z)`` over the encoded first batch. The caller bakes it in with
    ``model.clone(scale_factor=sf)`` — a static constant under jit, matching the
    reference's set-once-at-batch-0 buffer semantics."""
    if float(model.scale_factor) != 1.0:
        raise ValueError("rather not use custom rescaling and std-rescaling "
                         "simultaneously (reference ddpm.py:483)")
    z = model.apply({"params": params}, images, method=model.encode_first_stage)
    return float(1.0 / jnp.std(z))


def make_train_step(model: STEDM, schedule: DiffusionSchedule,
                    tx: optax.GradientTransformation, *,
                    loss_type: str = "l1", use_ema: bool = True,
                    learn_logvar: bool = False,
                    logvar_init: float = 0.0) -> Callable:
    """Build the jittable train step.

    ``batch``: dict with image [B,P,P,3], segmentation [B,P,P,2] one-hot,
    style_imgs [B,N,P,P,3] (style-drop already applied on the host side, matching
    the reference's dataset-side drop, flowers_ds.py:62-63).

    ``learn_logvar``: the per-timestep logvar buffer lives in the param tree
    (``init_logvar``) and receives gradients; otherwise a static buffer of
    ``logvar_init`` is used (zeros = the shipped config, reference ddpm.py:113-117).
    """
    static_logvar = (jnp.full((schedule.num_timesteps,), logvar_init, jnp.float32)
                     if logvar_init else None)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_t, rng_noise = jax.random.split(rng)

        def loss_fn(params):
            var = {"params": {k: v for k, v in params.items() if k != "logvar"}}
            z = model.apply(var, batch["image"], method=model.encode_first_stage)
            seg_cond = model.apply(var, batch["segmentation"], method=model.cond_encode)
            style = model.apply(var, batch["style_imgs"], True,
                                method=model.style_encode)
            # constant style sets (the style-drop fill, flowers_ds.py:62-63) make
            # every LayerNorm in the encoder see zero variance; its backward gain
            # 1/sqrt(eps) then compounds across depth and overflows. The value
            # passes through (the U-Net must still see the uncond signature), only
            # the encoder gradient is cut for those samples. The reference trains
            # with the same degenerate inputs but never updates its style encoder
            # (SURVEY.md Q1), so it never observes this.
            s = batch["style_imgs"].reshape(style.shape[0], -1)
            constant = (jnp.max(s, axis=1) - jnp.min(s, axis=1)) < 1e-6
            style = jnp.where(constant[:, None], jax.lax.stop_gradient(style), style)
            t = jax.random.randint(rng_t, (z.shape[0],), 0, schedule.num_timesteps)
            noise = jax.random.normal(rng_noise, z.shape, dtype=jnp.float32)

            def eps_fn(z_noisy, t_):
                return model.apply(var, z_noisy, t_, seg_cond, style, True,
                                   method=model.eps)

            logvar = params["logvar"] if learn_logvar else static_logvar
            loss, aux = p_losses(eps_fn, schedule, z, t, noise, loss_type=loss_type,
                                 logvar=logvar)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if use_ema:
            # every micro-batch, like the reference (ldm_diffusion.py:114-115)
            ema_params, ema_updates = ema_update(state.ema_params, params["unet"],
                                                 state.ema_updates)
        else:
            ema_params, ema_updates = state.ema_params, state.ema_updates
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema_params,
                               ema_updates=ema_updates)
        metrics = {"loss": loss, "loss_simple": aux["loss_simple"],
                   "loss_vlb": aux["loss_vlb"]}
        return new_state, metrics

    return train_step


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    ddim_steps: int = 128
    eta: float = 0.0
    cfg_scale: float = 1.5
    rescale_phi: float = 0.7
    batched_cfg: bool = True
    use_cfg: bool = True          # False when cfg_scale==1 or style_sampling==none
    latent_channels: int = 3
    downsample: int = 4           # VQ-f4
    method: str = "ddim"          # ddim | plms | dpm (DPM-Solver++ 2M)
    cache_interval: int = 1       # >1: DeepCache-style deep-feature reuse (serving
    cache_levels: int = 1         # mode; 1 = off = exact reference trajectory)
    cache_schedule: tuple = None  # explicit refresh positions (scan order, must
                                  # include 0) — non-uniform serving mode; see
                                  # core/cache_schedule.py. Mutually exclusive
                                  # with cache_interval > 1.
    cfg_interval: tuple = None    # (lo_frac, hi_frac): apply CFG only on scan
                                  # positions [lo*S, hi*S) (arXiv 2404.07724);
                                  # outside, only the cond branch evaluates.
                                  # None = guide every step (reference behavior).
    tile_stride_frac: float = 0.75  # latent tile stride (fraction of the latent
                                    # patch) for canvases larger than the patch


def check_tiled_supported(model: STEDM, cfg: SamplerConfig, use_cfg: bool) -> None:
    """Constraint checks shared by the scanned and host-driven canvas paths."""
    if cfg.method != "ddim":
        raise NotImplementedError("tiled canvases support DDIM only "
                                  f"(got method={cfg.method!r})")
    if cfg.cache_interval > 1 or cfg.cache_schedule is not None:
        raise ValueError("deep-feature caching is not supported on the tiled "
                         "canvas path")
    bottleneck_only = (not model.unet_config.get("use_spatial_transformer", False)
                       and model.conditioning_key == "hybrid")
    if use_cfg and not (cfg.batched_cfg and bottleneck_only):
        raise ValueError("tiled canvases with CFG require batched_cfg and "
                         "bottleneck-only conditioning (shared-encoder fan-out)")


def make_tiled_eps(model: STEDM, cfg: SamplerConfig, var: dict,
                   seg_cond: jnp.ndarray, ctx: jnp.ndarray, use_cfg: bool,
                   b: int):
    """Canvas eps evaluator: every evaluation runs over overlapping latent tiles
    stitched with the weight window (the reference's fold/unfold role,
    ddpm.py:905-987). Under CFG ``ctx`` is the [2b] concat of cond/uncond style
    vectors (shared-encoder fan-out) and the pair is packed into the tile's
    channel axis so both branches stitch in one pass."""
    from stedm_tpu.ops.tiled import tiled_apply

    lat_patch = model.patch_size // cfg.downsample
    stride = max(1, int(lat_patch * cfg.tile_stride_frac))
    c_lat = cfg.latent_channels

    if use_cfg:
        def eps_fn(x, t):
            canvas = jnp.concatenate([x, seg_cond.astype(x.dtype)], axis=-1)

            def tile_fn(tile):
                # shared-encoder fan-out: ctx at 2B, tile at B -> eps at 2B
                e = model.apply(var, tile[..., :c_lat], t, tile[..., c_lat:],
                                ctx, method=model.eps)
                return jnp.concatenate([e[:b], e[b:]], axis=-1)

            out = tiled_apply(tile_fn, canvas, lat_patch, stride,
                              out_channels=2 * c_lat)
            return out[..., :c_lat], out[..., c_lat:]
    else:
        def eps_fn(x, t):
            canvas = jnp.concatenate([x, seg_cond.astype(x.dtype)], axis=-1)

            def tile_fn(tile):
                return model.apply(var, tile[..., :c_lat], t, tile[..., c_lat:],
                                   ctx, method=model.eps)

            return tiled_apply(tile_fn, canvas, lat_patch, stride,
                               out_channels=c_lat)

    return eps_fn


def tiled_decode(model: STEDM, cfg: SamplerConfig, var: dict,
                 z: jnp.ndarray) -> jnp.ndarray:
    """Tiled VQ decode of an oversized latent canvas (reference ddpm.py:718-766)."""
    from stedm_tpu.ops.tiled import tiled_apply

    lat_patch = model.patch_size // cfg.downsample
    stride = max(1, int(lat_patch * cfg.tile_stride_frac))
    return tiled_apply(
        lambda zz: model.apply(var, zz, method=model.decode_first_stage),
        z, lat_patch, stride, out_channels=3, scale=cfg.downsample)


def _sample_tiled(model: STEDM, cfg: SamplerConfig, ddim: DDIMParams, var: dict,
                  seg_cond: jnp.ndarray, style_c: jnp.ndarray, batch: dict,
                  x_T: jnp.ndarray, use_cfg: bool, b: int,
                  rng_steps: jax.Array | None = None) -> jnp.ndarray:
    """Canvas sampling (scanned trajectory): tiled eps + tiled decode."""
    check_tiled_supported(model, cfg, use_cfg)
    if use_cfg:
        style_u = model.apply(var, jnp.zeros_like(batch["style_imgs"]) - 2.0,
                              method=model.style_encode)
        ctx = jnp.concatenate([style_c, style_u])
    else:
        ctx = style_c
    eps_fn = make_tiled_eps(model, cfg, var, seg_cond, ctx, use_cfg, b)

    scale = cfg.cfg_scale if use_cfg else 1.0
    z_0 = ddim_sample(eps_fn, x_T, ddim, cfg_scale=scale,
                      rescale_phi=cfg.rescale_phi, rng=rng_steps)
    return jnp.clip(tiled_decode(model, cfg, var, z_0), -1.0, 1.0)


def make_sample_fn(model: STEDM, schedule: DiffusionSchedule,
                   cfg: SamplerConfig) -> Callable:
    """Build the jittable synthetic-pair sampler (reference predict_step,
    modules/ldm_diffusion.py:76-107).

    Returns images in [-1, 1], [B,P,P,3]. The uncond branch uses the same layout
    with dropped (constant -2) style images (ldm_diffusion.py:86).

    Canvases larger than the training patch (segmentation H > model.patch_size)
    run every eps evaluation and the final decode through overlapping latent tiles
    with weighted stitching (`stedm_tpu.ops.tiled`) — the active counterpart of
    the reference's dormant fold/unfold path (reference ddpm.py:905-987).
    """
    ddim = DDIMParams.create(schedule, cfg.ddim_steps, cfg.eta)
    use_cfg = cfg.use_cfg and cfg.cfg_scale != 1.0
    # eta > 0 adds sigma_t * noise every step (reference ddim.py:202-207); the
    # per-step keys are only drawn when needed so the shipped eta=0 config keeps
    # its exact key sequence. Only DDIM is stochastic — the reference's PLMS
    # asserts ddim_eta == 0 (reference plms.py:30) and DPM-Solver ignores eta.
    stochastic = cfg.eta > 0
    if stochastic and cfg.method != "ddim":
        raise ValueError(f"eta={cfg.eta} requires method='ddim' (the reference's "
                         f"PLMS asserts ddim_eta == 0 and DPM-Solver ignores eta)")
    # guidance interval (arXiv 2404.07724): resolve fractions to scan positions;
    # full coverage degenerates to None so the unrestricted program (and its
    # bit-exact trajectory) is untouched
    glo, ghi = guided_range(ddim.num_steps, cfg.cfg_interval)
    cfg_interval = ((glo, ghi)
                    if use_cfg and cfg.cfg_interval is not None
                    and (glo > 0 or ghi < ddim.num_steps) else None)
    if cfg_interval is not None and cfg.method != "ddim":
        raise ValueError("cfg_interval is only supported for method='ddim'")

    def sample(params, batch: dict, rng: jax.Array) -> jnp.ndarray:
        # the logvar buffer (when trained) is a loss-only param group
        var = {"params": {k: v for k, v in params.items() if k != "logvar"}}
        seg = batch["segmentation"]
        b, p = seg.shape[0], seg.shape[1]
        seg_cond = model.apply(var, seg, method=model.cond_encode)
        style_c = model.apply(var, batch["style_imgs"], method=model.style_encode)

        rng_steps = None
        if stochastic:
            rng, rng_steps = jax.random.split(rng)
        latent = (b, p // cfg.downsample, p // cfg.downsample, cfg.latent_channels)
        x_T = jax.random.normal(rng, latent, dtype=jnp.float32)

        tiled = p > model.patch_size
        if tiled:
            if cfg_interval is not None:
                raise ValueError("cfg_interval is not supported on the tiled "
                                 "canvas path")
            return _sample_tiled(model, cfg, ddim, var, seg_cond, style_c, batch,
                                 x_T, use_cfg, b, rng_steps)

        if not use_cfg:
            def eps_fn(x, t):
                return model.apply(var, x, t, seg_cond, style_c, method=model.eps)
        else:
            style_u = model.apply(var, jnp.zeros_like(batch["style_imgs"]) - 2.0,
                                  method=model.style_encode)
            bottleneck_only = (not model.unet_config.get("use_spatial_transformer",
                                                         False)
                               and model.conditioning_key == "hybrid")
            if cfg.batched_cfg and bottleneck_only:
                # shared-encoder CFG: style enters only at the bottleneck, so the
                # encoder runs once at batch B and only the bottleneck+decoder fan
                # out over (cond, uncond) — ~15% fewer FLOPs, identical math
                ctx2 = jnp.concatenate([style_c, style_u])

                def eps_fn(x, t):
                    e = model.apply(var, x, t, seg_cond, ctx2, method=model.eps)
                    return e[:b], e[b:]
            elif cfg.batched_cfg:
                seg2 = jnp.concatenate([seg_cond, seg_cond])
                ctx2 = jnp.concatenate([style_c, style_u])

                def eps_fn(x, t):
                    e = model.apply(var, jnp.concatenate([x, x]),
                                    jnp.concatenate([t, t]), seg2, ctx2,
                                    method=model.eps)
                    return e[:b], e[b:]
            else:
                def eps_fn(x, t):
                    e_c = model.apply(var, x, t, seg_cond, style_c, method=model.eps)
                    e_u = model.apply(var, x, t, seg_cond, style_u, method=model.eps)
                    return e_c, e_u

        scale = cfg.cfg_scale if use_cfg else 1.0
        if cfg_interval is not None:
            # cond-only evaluation for the unguided segments: batch-b, shared
            # seg conditioning, conditional style context only
            def eps_cond_fn(x, t):
                return model.apply(var, x, t, seg_cond, style_c,
                                   method=model.eps)
        if cfg.cache_interval > 1 or cfg.cache_schedule is not None:
            if cfg.cache_interval > 1 and cfg.cache_schedule is not None:
                raise ValueError("cache_interval > 1 and cache_schedule are "
                                 "mutually exclusive refresh placements")
            if cfg.method != "ddim":
                raise ValueError("deep-feature caching is only supported for DDIM")
            if use_cfg and not (cfg.batched_cfg and bottleneck_only):
                raise ValueError(
                    "deep-feature caching with CFG requires batched_cfg and "
                    "bottleneck-only conditioning (shared-encoder fan-out)")

            if use_cfg:
                ctx2_c = jnp.concatenate([style_c, style_u])

                def eps_full_fn(x, t):
                    e, cache = model.apply(var, x, t, seg_cond, ctx2_c,
                                           cfg.cache_levels, method=model.eps_full)
                    return (e[:b], e[b:]), cache

                def eps_cached_fn(x, t, cache):
                    e = model.apply(var, x, t, seg_cond, cache, cfg.cache_levels,
                                    method=model.eps_cached)
                    return (e[:b], e[b:])
            else:
                def eps_full_fn(x, t):
                    return model.apply(var, x, t, seg_cond, style_c,
                                       cfg.cache_levels, method=model.eps_full)

                def eps_cached_fn(x, t, cache):
                    return model.apply(var, x, t, seg_cond, cache,
                                       cfg.cache_levels, method=model.eps_cached)

            if cfg_interval is not None:
                # combined serving mode: trunk cache + guidance interval.
                # Unguided steps evaluate the cond branch only at batch B —
                # full/cached twins without the CFG pair split.
                from stedm_tpu.core.ddim import ddim_sample_scheduled_guided

                def eps_full_cond_fn(x, t):
                    return model.apply(var, x, t, seg_cond, style_c,
                                       cfg.cache_levels, method=model.eps_full)

                def eps_cached_cond_fn(x, t, cache):
                    return model.apply(var, x, t, seg_cond, cache,
                                       cfg.cache_levels,
                                       method=model.eps_cached)

                positions = (cfg.cache_schedule
                             if cfg.cache_schedule is not None
                             else tuple(range(0, ddim.num_steps,
                                              cfg.cache_interval)))
                z_0 = ddim_sample_scheduled_guided(
                    eps_full_fn, eps_cached_fn, eps_full_cond_fn,
                    eps_cached_cond_fn, x_T, ddim,
                    refresh_positions=positions, guided_lo=cfg_interval[0],
                    guided_hi=cfg_interval[1], cfg_scale=scale,
                    rescale_phi=cfg.rescale_phi, rng=rng_steps)
            elif cfg.cache_schedule is not None:
                from stedm_tpu.core.ddim import ddim_sample_scheduled

                z_0 = ddim_sample_scheduled(
                    eps_full_fn, eps_cached_fn, x_T, ddim,
                    refresh_positions=cfg.cache_schedule, cfg_scale=scale,
                    rescale_phi=cfg.rescale_phi, rng=rng_steps)
            else:
                z_0 = ddim_sample_cached(eps_full_fn, eps_cached_fn, x_T, ddim,
                                         cache_interval=cfg.cache_interval,
                                         cfg_scale=scale,
                                         rescale_phi=cfg.rescale_phi,
                                         rng=rng_steps)
        elif cfg.method == "plms":
            from stedm_tpu.core.plms import plms_sample

            z_0 = plms_sample(eps_fn, x_T, ddim, cfg_scale=scale,
                              rescale_phi=cfg.rescale_phi)
        elif cfg.method == "dpm":
            from stedm_tpu.core.dpm_solver import dpm_solver_pp_sample

            z_0 = dpm_solver_pp_sample(eps_fn, x_T, schedule, cfg.ddim_steps,
                                       cfg_scale=scale, rescale_phi=cfg.rescale_phi)
        elif cfg_interval is not None:
            from stedm_tpu.core.ddim import ddim_sample_guided

            z_0 = ddim_sample_guided(eps_fn, eps_cond_fn, x_T, ddim,
                                     guided_lo=cfg_interval[0],
                                     guided_hi=cfg_interval[1], cfg_scale=scale,
                                     rescale_phi=cfg.rescale_phi, rng=rng_steps)
        else:
            z_0 = ddim_sample(eps_fn, x_T, ddim, cfg_scale=scale,
                              rescale_phi=cfg.rescale_phi, rng=rng_steps)
        img = model.apply(var, z_0, method=model.decode_first_stage)
        return jnp.clip(img, -1.0, 1.0)

    return sample
