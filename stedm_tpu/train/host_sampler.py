"""Host-driven DDIM sampling: the scan-free twin of `make_sample_fn`.

`make_sample_fn` compiles the whole DDIM trajectory into one `lax.scan` — the
right shape for a real TPU runtime (one program, zero host round-trips). Under
the axon remote-execution tunnel, however, the AOT compile service fails to
compile ANY program containing an XLA loop around the U-Net within the tunnel's
request limit (a bare eps forward compiles in ~100 s; wrapping the identical
body in a length-1 `lax.scan` exceeds 30+ min and the request drops), while
host-driven dispatch of the per-step jitted program pipelines at device speed
(~21 ms/step measured vs ~19 ms/step in-scan; JAX's async dispatch keeps the
chip busy).

So this module runs the SAME per-step math (`ddim_step` + `rescaled_cfg`, every
CFG mode, and the DeepCache-style cached serving mode) as a Python loop over
per-step jitted programs with the step constants passed as scalar arguments —
one compile for all steps. Trajectories are verified equal to the scanned
sampler by `tests/test_host_sampler.py`.

Use `host_loop_default()` to decide: True under the axon tunnel, False on real
TPU slices / CPU where the scanned program is preferable. PLMS / DPM-Solver and
tiled canvases remain scan-only (use `make_sample_fn`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.core.ddim import DDIMParams, ddim_step, rescaled_cfg
from stedm_tpu.core.schedules import DiffusionSchedule
from stedm_tpu.models.stedm import STEDM
from stedm_tpu.train.steps import SamplerConfig


def host_loop_default() -> bool:
    """True when running through the axon remote tunnel (where XLA-loop
    programs fail to compile, see module docstring)."""
    try:
        plats = jax.config.jax_platforms or ""
    except AttributeError:  # pragma: no cover - very old jax
        plats = ""
    return "axon" in plats.split(",")


def make_auto_sample_fn(model: STEDM, schedule: DiffusionSchedule,
                        cfg: SamplerConfig, jit_kwargs: dict | None = None
                        ) -> Callable:
    """The host-loop sampler when running through the axon tunnel (DDIM,
    single-canvas, single-process), else the jitted scanned sampler. Callers
    that shard over a mesh or synthesize canvases should use `make_sample_fn`
    directly."""
    if host_loop_default() and cfg.method == "ddim":
        return make_host_sample_fn(model, schedule, cfg)
    from stedm_tpu.train.steps import make_sample_fn

    return jax.jit(make_sample_fn(model, schedule, cfg), **(jit_kwargs or {}))


def make_host_sample_fn(model: STEDM, schedule: DiffusionSchedule,
                        cfg: SamplerConfig, unroll: int | None = None
                        ) -> Callable:
    """Build a host-driven sampler with `make_sample_fn` semantics
    (reference predict_step, modules/ldm_diffusion.py:76-107): returns
    ``sample(params, batch, rng) -> images in [-1, 1]``.

    ``unroll``: steps dispatched per jitted block in exact mode (default: the
    largest of 5..2 dividing the step count). Cached serving mode always blocks
    by ``cache_interval``. The returned callable is NOT jittable (it is already
    composed of jitted pieces); do not wrap it in jax.jit.
    """
    if cfg.method != "ddim":
        raise NotImplementedError(
            "host-loop sampling supports DDIM only; use make_sample_fn "
            f"(scan) for method={cfg.method!r}")

    ddim = DDIMParams.create(schedule, cfg.ddim_steps, cfg.eta)
    use_cfg = cfg.use_cfg and cfg.cfg_scale != 1.0
    interval = int(cfg.cache_interval)
    scale = cfg.cfg_scale if use_cfg else 1.0
    bottleneck_only = (not model.unet_config.get("use_spatial_transformer", False)
                       and model.conditioning_key == "hybrid")
    shared_enc = use_cfg and cfg.batched_cfg and bottleneck_only
    if interval > 1 and use_cfg and not shared_enc:
        raise ValueError(
            "cache_interval > 1 with CFG requires batched_cfg and "
            "bottleneck-only conditioning (shared-encoder fan-out)")

    # host copies of the per-step constants, high-noise step first
    order = np.arange(ddim.num_steps - 1, -1, -1)
    consts = [np.asarray(a)[order] for a in
              (ddim.timesteps, ddim.alphas, ddim.alphas_prev, ddim.sigmas,
               ddim.sqrt_one_minus_alphas)]
    stochastic = cfg.eta != 0.0

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

    def eps_pair(var, x, ts, seg_cond, ctx):
        """-> (e_cond, e_uncond) or a single eps when CFG is off; mirrors the
        mode dispatch in make_sample_fn."""
        b = x.shape[0]
        if not use_cfg:
            return model.apply(var, x, ts, seg_cond, ctx, method=model.eps)
        if shared_enc:
            e = model.apply(var, x, ts, seg_cond, ctx, method=model.eps)
            return e[:b], e[b:]
        if cfg.batched_cfg:
            e = model.apply(var, jnp.concatenate([x, x]),
                            jnp.concatenate([ts, ts]),
                            jnp.concatenate([seg_cond, seg_cond]), ctx,
                            method=model.eps)
            return e[:b], e[b:]
        e_c = model.apply(var, x, ts, seg_cond, ctx[:b], method=model.eps)
        e_u = model.apply(var, x, ts, seg_cond, ctx[b:], method=model.eps)
        return e_c, e_u

    def update(x, out, a_t, a_prev, sigma_t, sq1m, key):
        if use_cfg:
            e_t = rescaled_cfg(out[0], out[1], scale, cfg.rescale_phi)
        else:
            e_t = out
        noise = (jax.random.normal(key, x.shape, dtype=jnp.float32)
                 if stochastic else None)
        x_prev, _ = ddim_step(x, e_t, a_t, a_prev, sigma_t, sq1m, noise=noise)
        return x_prev

    # ---- block partition -------------------------------------------------
    # dispatch k consecutive steps as ONE jitted program with the body
    # unrolled inline (no XLA loop construct, so the tunnel's compile service
    # handles it) — k-fold fewer host dispatches. In cached serving mode the
    # natural block is [full refresh + (interval-1) cached steps], so the deep
    # -feature cache never leaves the program. Exact mode prefers an unroll
    # factor dividing the step count to avoid compiling a tail-size program.
    steps = ddim.num_steps
    if interval > 1:
        block_k = interval
    elif unroll:
        block_k = int(unroll)
    else:
        block_k = next((k for k in (5, 4, 3, 2) if steps % k == 0),
                       min(5, steps))
    sizes = [min(block_k, steps - s) for s in range(0, steps, block_k)]

    def _make_block(k: int):
        def fn(var, x, seg_cond, ctx, tb, ab, apb, sgb, sqb, keys):
            b = x.shape[0]
            cache = None
            for j in range(k):  # static unroll
                ts = jnp.full((b,), tb[j], dtype=jnp.int32)
                key = keys[j] if stochastic else keys
                if interval > 1 and j == 0:
                    if use_cfg:  # shared-encoder fan-out (ctor-checked)
                        e, cache = model.apply(var, x, ts, seg_cond, ctx,
                                               cfg.cache_levels,
                                               method=model.eps_full)
                        out = (e[:b], e[b:])
                    else:
                        out, cache = model.apply(var, x, ts, seg_cond, ctx,
                                                 cfg.cache_levels,
                                                 method=model.eps_full)
                elif interval > 1:
                    e = model.apply(var, x, ts, seg_cond, cache,
                                    cfg.cache_levels, method=model.eps_cached)
                    out = (e[:b], e[b:]) if use_cfg else e
                else:
                    out = eps_pair(var, x, ts, seg_cond, ctx)
                x = update(x, out, ab[j], apb[j], sgb[j], sqb[j], key)
            return x
        return jax.jit(fn, donate_argnums=(1,))

    block_fns = {k: _make_block(k) for k in sorted(set(sizes))}
    # per-block step constants as device-resident [k] arrays, built once
    block_consts = []
    start = 0
    for k in sizes:
        block_consts.append(tuple(jnp.asarray(c[start:start + k])
                                  for c in consts))
        start += k

    @jax.jit
    def decode(var, z):
        return jnp.clip(model.apply(var, z, method=model.decode_first_stage),
                        -1.0, 1.0)

    def sample(params, batch: dict, rng: jax.Array) -> jnp.ndarray:
        var = {"params": {k: v for k, v in params.items() if k != "logvar"}}
        seg = batch["segmentation"]
        b, p = seg.shape[0], seg.shape[1]
        if p > model.patch_size:
            raise NotImplementedError(
                "tiled canvases are scan-only; use make_sample_fn")
        seg_cond, ctx = prep(var, batch)

        latent = (b, p // cfg.downsample, p // cfg.downsample,
                  cfg.latent_channels)
        x = jax.random.normal(rng, latent, dtype=jnp.float32)

        # same key sequence as ddim_sample's step_keys (index 0 = highest noise)
        step_keys = jax.random.split(rng, steps) if stochastic else None

        i = 0
        for k, cb in zip(sizes, block_consts):
            keys = step_keys[i:i + k] if stochastic else rng
            x = block_fns[k](var, x, seg_cond, ctx, *cb, keys)
            i += k
        return decode(var, x)

    return sample
