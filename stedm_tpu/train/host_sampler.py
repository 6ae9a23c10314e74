"""Host-driven block sampling: the scan-free twin of `make_sample_fn`.

`make_sample_fn` compiles the whole DDIM trajectory into one `lax.scan`. This
module runs the SAME per-step math (`ddim_step` + `rescaled_cfg`, every CFG
mode, the DeepCache-style cached serving mode, PLMS and DPM-Solver++(2M)) as a
Python loop over k-step unrolled jitted block programs, with step constants as
scalar arguments and the latent donated between blocks. Trajectories are
verified equal to the scanned samplers by `tests/test_host_sampler.py`.

Why it exists (measured on the axon remote-execution terminal, v5e):

* **throughput** — JAX's async dispatch pipelines the blocks back-to-back:
  within ~1% of the one-program scan, slightly ahead on the test chip (exact
  256² DDIM-50 CFG: 7.97 vs 7.90 img/s; serving 18.05 vs 17.87).
* **compile latency** — a block compiles in ~2 min vs the scan's
  one-program-per-configuration compiles, so sweeps and serving restarts are
  ~20x cheaper.
* **robustness** — remote-compile services upload the serialized module;
  smaller programs keep requests comfortably under transport limits. (Related
  trap, documented in CLAUDE.md: a jitted function that CLOSES OVER the param
  tree inlines ~GBs of constants into the module and the upload drops — params
  must always be jit arguments; with that fixed the scan does compile.)

Use `host_loop_default()` to decide: True under the axon tunnel, False on real
TPU slices / CPU where the single scanned program avoids dispatch entirely.
Tiled canvases (layouts larger than the training patch) ARE host-drivable for
exact DDIM: the tiled eps/decode (`steps.make_tiled_eps`/`tiled_decode`) runs
inside each block program; PLMS/DPM and the cached serving mode stay
patch-only on canvases (same constraints as the scanned twin).
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


_HEURISTIC_LOGGED = False


def host_loop_default() -> bool:
    """True when running through the axon remote tunnel (where the block drive
    is slightly faster and far cheaper to compile, see module docstring).

    This is a platform-string sniff, and it silently changes the execution
    strategy (and compile cost); a differently-named remote runtime gets the
    scan. Log once when it fires so deployments can see which strategy was
    picked (VERDICT r2 weak #5)."""
    global _HEURISTIC_LOGGED
    try:
        plats = jax.config.jax_platforms or ""
    except AttributeError:  # pragma: no cover - very old jax
        plats = ""
    hit = "axon" in plats.split(",")
    if hit and not _HEURISTIC_LOGGED:
        import sys

        print("stedm: remote-tunnel platform detected (jax_platforms="
              f"{plats!r}); defaulting samplers to the host-driven block loop "
              "(override with +host_loop=false)", file=sys.stderr)
        _HEURISTIC_LOGGED = True
    return hit


def make_auto_sample_fn(model: STEDM, schedule: DiffusionSchedule,
                        cfg: SamplerConfig, jit_kwargs: dict | None = None
                        ) -> Callable:
    """The host-loop sampler when running through the axon tunnel (DDIM,
    single-canvas, single-process), else the jitted scanned sampler. Callers
    that shard over a mesh or synthesize canvases should use `make_sample_fn`
    directly."""
    if host_loop_default() and cfg.method in ("ddim", "plms", "dpm"):
        return make_host_sample_fn(model, schedule, cfg)
    from stedm_tpu.train.steps import make_sample_fn

    return jax.jit(make_sample_fn(model, schedule, cfg), **(jit_kwargs or {}))


def make_host_sample_fn(model: STEDM, schedule: DiffusionSchedule,
                        cfg: SamplerConfig, unroll: int | None = None,
                        carry_cache: bool | None = None) -> Callable:
    """Build a host-driven sampler with `make_sample_fn` semantics
    (reference predict_step, modules/ldm_diffusion.py:76-107): returns
    ``sample(params, batch, rng) -> images in [-1, 1]``.

    ``unroll``: steps dispatched per jitted block in exact mode (default: the
    largest of 5..2 dividing the step count). Cached serving mode always blocks
    by ``cache_interval``. Methods: ddim (incl. cached serving mode), plms,
    dpm — the multistep state (eps history / previous x0) threads through the
    blocks as donated arrays, and the multistep coefficients are schedule
    -static so each order is a static branch, not a `lax.cond`. The returned
    callable is NOT jittable (it is already composed of jitted pieces); do not
    wrap it in jax.jit.

    ``carry_cache``: in cached serving mode, thread the deep-feature cache
    BETWEEN block programs (as a donated argument/output) instead of requiring
    every block to start at a refresh. The trajectory then chunks into uniform
    ``unroll``-sized blocks regardless of refresh placement — a sparse
    `cache_schedule` no longer produces one oversized program per long refresh
    period (the 2026-08-19 frontier sweep measured those to dispatch
    pathologically: auto:4's 25-step block ran SLOWER end-to-end than auto:5's
    18-step one despite strictly less math). Same per-step math, same
    trajectory — only the program partition changes. Default: the
    ``STEDM_BLOCK_CARRY`` env var (off).
    """
    if cfg.method not in ("ddim", "plms", "dpm"):
        raise NotImplementedError(f"unknown sampler method {cfg.method!r}")
    if carry_cache is None:
        import os

        carry_cache = os.environ.get("STEDM_BLOCK_CARRY", "") not in (
            "", "0", "false", "False")
    caching = cfg.cache_interval > 1 or cfg.cache_schedule is not None
    if cfg.method != "ddim" and caching:
        # mirror make_sample_fn's check (train/steps.py) — silently sampling
        # uncached would misreport serving-mode throughput
        raise ValueError("deep-feature caching is only supported for DDIM")
    if cfg.cache_interval > 1 and cfg.cache_schedule is not None:
        raise ValueError("cache_interval > 1 and cache_schedule are mutually "
                         "exclusive refresh placements")
    if cfg.eta > 0 and cfg.method != "ddim":
        # mirror make_sample_fn: the reference's PLMS asserts ddim_eta == 0
        # (reference plms.py:30) and DPM-Solver ignores eta
        raise ValueError(f"eta={cfg.eta} requires method='ddim'")

    ddim = DDIMParams.create(schedule, cfg.ddim_steps, cfg.eta)
    use_cfg = cfg.use_cfg and cfg.cfg_scale != 1.0
    # guidance interval (arXiv 2404.07724, core/ddim.py:ddim_sample_guided):
    # CFG applies only on scan positions [glo, ghi); outside, the uncond half
    # of the fan-out is skipped (cond-only evaluation at batch B). Full
    # coverage degenerates to None so the unrestricted programs stay
    # bit-identical.
    from stedm_tpu.core.ddim import guided_range

    glo, ghi = guided_range(ddim.num_steps, cfg.cfg_interval)
    cfg_interval = ((glo, ghi)
                    if use_cfg and cfg.cfg_interval is not None
                    and (glo > 0 or ghi < ddim.num_steps) else None)
    if cfg_interval is not None and cfg.method != "ddim":
        raise ValueError("cfg_interval is only supported for method='ddim'")
    guided = np.ones(ddim.num_steps, bool)
    if cfg_interval is not None:
        guided[:] = False
        guided[glo:ghi] = True
    interval = int(cfg.cache_interval)
    scale = cfg.cfg_scale if use_cfg else 1.0
    bottleneck_only = (not model.unet_config.get("use_spatial_transformer", False)
                       and model.conditioning_key == "hybrid")
    shared_enc = use_cfg and cfg.batched_cfg and bottleneck_only
    if caching and use_cfg and not shared_enc:
        raise ValueError(
            "deep-feature caching with CFG requires batched_cfg and "
            "bottleneck-only conditioning (shared-encoder fan-out)")

    # host copies of the per-step constants, high-noise step first
    order = np.arange(ddim.num_steps - 1, -1, -1)
    consts = [np.asarray(a)[order] for a in
              (ddim.timesteps, ddim.alphas, ddim.alphas_prev, ddim.sigmas,
               ddim.sqrt_one_minus_alphas)]
    # eta > 0 adds sigma_t * noise each step (reference ddim.py:202-207); the
    # key split and per-step key sequence mirror the scanned twin
    # (make_sample_fn / ddim_sample) exactly, so trajectories stay equal
    stochastic = cfg.eta > 0

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

    lat_patch = model.patch_size // cfg.downsample

    def eps_pair(var, x, ts, seg_cond, ctx):
        """-> (e_cond, e_uncond) or a single eps when CFG is off; mirrors the
        mode dispatch in make_sample_fn. Latents wider than the training patch
        evaluate through overlapping stitched tiles (`steps.make_tiled_eps`,
        the fold/unfold role) — constraint-checked in `_sample_shell`."""
        b = x.shape[0]
        if x.shape[1] > lat_patch:
            from stedm_tpu.train.steps import make_tiled_eps

            return make_tiled_eps(model, cfg, var, seg_cond, ctx, use_cfg,
                                  b)(x, ts)
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

    def eps_cond(var, x, ts, seg_cond, ctx):
        """Cond-only evaluation for unguided steps (batch B; skips the uncond
        half of the shared-encoder fan-out). ``ctx`` is the [2B] cond/uncond
        concat under CFG — row slice [:B] is the conditional style context."""
        b = x.shape[0]
        return model.apply(var, x, ts, seg_cond, ctx[:b] if use_cfg else ctx,
                           method=model.eps)

    def update(x, out, a_t, a_prev, sigma_t, sq1m, key, g=True):
        if use_cfg and g:
            e_t = rescaled_cfg(out[0], out[1], scale, cfg.rescale_phi)
        else:
            e_t = out.astype(jnp.float32)
        noise = (jax.random.normal(key, x.shape, dtype=jnp.float32)
                 if stochastic else None)
        x_prev, _ = ddim_step(x, e_t, a_t, a_prev, sigma_t, sq1m, noise=noise)
        return x_prev

    def eval_e(var, x, ts, seg_cond, ctx):
        """CFG-resolved eps prediction, float32."""
        out = eps_pair(var, x, ts, seg_cond, ctx)
        if use_cfg:
            return rescaled_cfg(out[0], out[1], scale, cfg.rescale_phi)
        return out

    @jax.jit
    def decode(var, z):
        if z.shape[1] > lat_patch:
            from stedm_tpu.train.steps import tiled_decode

            return jnp.clip(tiled_decode(model, cfg, var, z), -1.0, 1.0)
        return jnp.clip(model.apply(var, z, method=model.decode_first_stage),
                        -1.0, 1.0)

    def _sample_shell(block_loop):
        """Common wrapper: conditioning prep, x_T draw, block loop, decode."""
        def sample(params, batch: dict, rng: jax.Array) -> jnp.ndarray:
            var = {"params": {k: v for k, v in params.items() if k != "logvar"}}
            seg = batch["segmentation"]
            b, p = seg.shape[0], seg.shape[1]
            if p > model.patch_size:
                # host-block canvas drive (CLAUDE.md roadmap 2): the tiled eps
                # and decode take over inside the blocks; same constraints as
                # the scanned twin
                from stedm_tpu.train.steps import check_tiled_supported

                check_tiled_supported(model, cfg, use_cfg)
                if cfg_interval is not None:
                    raise ValueError("cfg_interval is not supported on the "
                                     "tiled canvas path")
            seg_cond, ctx = prep(var, batch)
            rng_steps = None
            if stochastic:  # same split as make_sample_fn's stochastic branch
                rng, rng_steps = jax.random.split(rng)
            latent = (b, p // cfg.downsample, p // cfg.downsample,
                      cfg.latent_channels)
            x = jax.random.normal(rng, latent, dtype=jnp.float32)
            return decode(var, block_loop(var, x, seg_cond, ctx, rng_steps))
        return sample

    def _partition(steps: int, k: int) -> list[int]:
        return [min(k, steps - s) for s in range(0, steps, k)]

    def _default_unroll(steps: int) -> int:
        if unroll:
            return int(unroll)
        return next((k for k in (5, 4, 3, 2) if steps % k == 0), min(5, steps))

    if cfg.method == "plms":
        return _sample_shell(_plms_blocks(
            model, cfg, ddim, eval_e, _partition, _default_unroll))
    if cfg.method == "dpm":
        return _sample_shell(_dpm_blocks(
            model, cfg, schedule, eval_e, _partition, _default_unroll))

    # ---- block partition -------------------------------------------------
    # dispatch k consecutive steps as ONE jitted program with the body
    # unrolled inline — k-fold fewer host dispatches, and XLA fuses across the
    # steps of a block. In cached serving mode every block starts with a full
    # refresh and carries the deep-feature cache inside the program (uniform
    # intervals additionally unroll m whole periods per block; a non-uniform
    # `cache_schedule` blocks one refresh period each, so period lengths stay
    # the only axis of program variety). Exact mode prefers an unroll factor
    # dividing the step count to avoid compiling a tail-size program.
    steps = ddim.num_steps
    if caching:
        from stedm_tpu.core.cache_schedule import (coalesce_blocks,
                                                   validate_positions)

        # a guided shallow step must reuse a cache that carries the cond/uncond
        # fan-out, so the guidance interval's entry step is forced to refresh
        # (its governing refresh is then itself guided)
        forced = ({glo} if cfg_interval is not None and ghi > glo
                  and glo < steps else set())
        if cfg.cache_schedule is not None:
            refresh_set = (set(validate_positions(cfg.cache_schedule, steps))
                           | forced)
            if carry_cache:
                # cache threads between blocks, so boundaries need not sit on
                # refreshes: uniform budget-sized chunks, no oversized program
                # for a long refresh period
                block_starts = list(range(0, steps,
                                          int(unroll) if unroll else 10))
            else:
                # coalesce consecutive refresh periods into one block while
                # the block stays within the unroll budget: fewer host
                # dispatches (the block loop is host-latency-sensitive on
                # remote terminals) at the price of more distinct
                # (size, pattern) programs to compile — and one OVERSIZED
                # program per refresh period longer than the budget
                block_starts = coalesce_blocks(sorted(refresh_set), steps,
                                               int(unroll) if unroll else 10)
        else:
            refresh_set = set(range(0, steps, interval)) | forced
            if carry_cache:
                block_starts = list(range(0, steps,
                                          int(unroll) if unroll else 10))
            else:
                m = max(1, int(unroll) // interval) if unroll else 1
                block_starts = list(range(0, steps, interval * m))
        sizes = [b2 - b1 for b1, b2 in
                 zip(block_starts, block_starts[1:] + [steps])]
        patterns = []
        s0 = 0
        for k in sizes:
            patterns.append(tuple((s0 + j) in refresh_set for j in range(k)))
            s0 += k
        # invariant behind the static cache-rows tracking in the block bodies:
        # every guided shallow step's governing refresh is itself guided
        gov = 0
        for k in range(steps):
            gov = k if k in refresh_set else gov
            assert not (guided[k] and not guided[gov]), (k, gov)
        # static cache state at each block entry: None = no live cache (block
        # starts at-or-before the first refresh — position 0 is always a
        # refresh, so only block 0), else whether the governing refresh was
        # guided (cache carries the 2B cond/uncond fan-out). Non-carry blocks
        # all start at a refresh and never consume an entry cache.
        entry_states: list[bool | None] = []
        if carry_cache:
            gov_guided: bool | None = None
            s0 = 0
            for k in sizes:
                entry_states.append(gov_guided)
                for j in range(k):
                    if (s0 + j) in refresh_set:
                        gov_guided = bool(use_cfg and guided[s0 + j])
                s0 += k
            assert entry_states[0] is None and patterns[0][0]
        else:
            entry_states = [None] * len(sizes)
    else:
        sizes = _partition(steps, _default_unroll(steps))
        patterns = [None] * len(sizes)
        entry_states = [None] * len(sizes)
    gpatterns = []
    s0 = 0
    for k in sizes:
        gpatterns.append(tuple(bool(guided[s0 + j]) for j in range(k)))
        s0 += k

    def _make_block(k: int, pattern: tuple[bool, ...] | None,
                    gpat: tuple[bool, ...], entry_g: bool | None = None,
                    carry: bool = False):
        def body(var, x, cache, cache_guided, seg_cond, ctx,
                 tb, ab, apb, sgb, sqb, keys):
            # cache_guided is STATIC: does the live cache carry the 2B fan-out?
            b = x.shape[0]
            for j in range(k):  # static unroll
                ts = jnp.full((b,), tb[j], dtype=jnp.int32)
                key = keys[j] if stochastic else keys
                g = gpat[j]
                if pattern is not None and pattern[j]:
                    if use_cfg and g:  # shared-encoder fan-out (ctor-checked)
                        e, cache = model.apply(var, x, ts, seg_cond, ctx,
                                               cfg.cache_levels,
                                               method=model.eps_full)
                        out = (e[:b], e[b:])
                        cache_guided = True
                    else:
                        ctx_c = ctx[:b] if use_cfg else ctx
                        out, cache = model.apply(var, x, ts, seg_cond, ctx_c,
                                                 cfg.cache_levels,
                                                 method=model.eps_full)
                        cache_guided = False
                elif pattern is not None:
                    if use_cfg and g:
                        # construction guarantees the governing refresh was
                        # guided, so the cache already carries the 2B fan-out
                        e = model.apply(var, x, ts, seg_cond, cache,
                                        cfg.cache_levels,
                                        method=model.eps_cached)
                        out = (e[:b], e[b:])
                    else:
                        c = (jax.tree_util.tree_map(lambda a: a[:b], cache)
                             if cache_guided else cache)
                        out = model.apply(var, x, ts, seg_cond, c,
                                          cfg.cache_levels,
                                          method=model.eps_cached)
                elif not use_cfg or g:
                    out = eps_pair(var, x, ts, seg_cond, ctx)
                else:
                    out = eps_cond(var, x, ts, seg_cond, ctx)
                x = update(x, out, ab[j], apb[j], sgb[j], sqb[j], key, g)
            return x, cache

        if carry:
            # cache threads between blocks: donated input (None only for the
            # first block — position 0 is always a refresh), returned output
            def fn(var, x, cache, seg_cond, ctx, tb, ab, apb, sgb, sqb, keys):
                return body(var, x, cache, bool(entry_g), seg_cond, ctx,
                            tb, ab, apb, sgb, sqb, keys)
            return jax.jit(fn, donate_argnums=(1, 2))

        def fn(var, x, seg_cond, ctx, tb, ab, apb, sgb, sqb, keys):
            return body(var, x, None, False, seg_cond, ctx,
                        tb, ab, apb, sgb, sqb, keys)[0]
        return jax.jit(fn, donate_argnums=(1,))

    carry = bool(carry_cache) and caching
    block_fns = {}
    for k, pat, gpat, eg in zip(sizes, patterns, gpatterns, entry_states):
        block_fns.setdefault((k, pat, gpat, eg),
                             _make_block(k, pat, gpat, eg, carry))
    # per-block step constants as device-resident [k] arrays, built once
    block_consts = []
    start = 0
    for k in sizes:
        block_consts.append(tuple(jnp.asarray(c[start:start + k])
                                  for c in consts))
        start += k

    def block_loop(var, x, seg_cond, ctx, rng):
        # same key sequence as ddim_sample's step_keys (index 0 = highest noise)
        step_keys = jax.random.split(rng, steps) if stochastic else None
        i = 0
        cache = None
        times = [] if _block_timing() else None
        for k, pat, gpat, eg, cb in zip(sizes, patterns, gpatterns,
                                        entry_states, block_consts):
            keys = step_keys[i:i + k] if stochastic else rng
            if times is not None:
                t0 = _sync(x)
            if carry:
                x, cache = block_fns[(k, pat, gpat, eg)](
                    var, x, cache, seg_cond, ctx, *cb, keys)
            else:
                x = block_fns[(k, pat, gpat, eg)](var, x, seg_cond, ctx, *cb,
                                                  keys)
            i += k
            if times is not None:
                times.append(_sync(x) - t0)
        if times is not None:
            import sys

            print("block times (size:s): " + " ".join(
                f"{k}:{t:.4f}" for k, t in zip(sizes, times)), file=sys.stderr)
        return x

    return _sample_shell(block_loop)


def _block_timing() -> bool:
    """STEDM_HOST_BLOCK_TIMING=1 prints per-block device times from the DDIM
    block loop (diagnostic; the per-block sync destroys the async pipelining
    the loop normally relies on, so only per-block RELATIVE times are
    meaningful, not the trajectory total)."""
    import os

    return os.environ.get("STEDM_HOST_BLOCK_TIMING", "") not in ("", "0")


def _sync(x) -> float:
    """True-completion sync point: a 4-byte host readback that depends on
    ``x`` (CLAUDE.md: through the remote tunnel, block_until_ready alone can
    return before the program finishes there)."""
    import time

    float(jnp.mean(x))
    return time.perf_counter()


def _plms_blocks(model, cfg, ddim, eval_e, partition, default_unroll):
    """Host-block PLMS (counterpart of `core/plms.py`'s scan): the eps history
    threads through blocks as three donated arrays, and the Adams-Bashforth
    order at each position is STATIC (position-determined), so the scan's
    `lax.cond`/`where` order dispatch disappears."""
    steps = ddim.num_steps
    idx = np.arange(steps - 1, -1, -1)           # position -> ddim table index
    ts_seq = np.asarray(ddim.timesteps)[idx]
    ts_next = np.concatenate([ts_seq[1:], np.zeros(1, ts_seq.dtype)])
    tables = [np.asarray(a)[idx] for a in
              (ddim.alphas, ddim.alphas_prev, ddim.sigmas,
               ddim.sqrt_one_minus_alphas)]

    sizes = partition(steps, default_unroll(steps))

    def make_block(k: int, pattern: tuple[int, ...]):
        def fn(var, x, h0, h1, h2, seg_cond, ctx, tb, tnb, ab, apb, sgb, sqb):
            b = x.shape[0]
            for j in range(k):  # static unroll; pattern[j] = AB order in use
                ts = jnp.full((b,), tb[j], jnp.int32)
                e_t = eval_e(var, x, ts, seg_cond, ctx)
                n = pattern[j]
                if n == 0:
                    # 2-evaluation trapezoid bootstrap (reference plms.py)
                    x_prev0 = ddim_step(x, e_t, ab[j], apb[j], sgb[j], sqb[j])[0]
                    tsn = jnp.full((b,), tnb[j], jnp.int32)
                    e_next = eval_e(var, x_prev0, tsn, seg_cond, ctx)
                    e_prime = (e_t + e_next) / 2.0
                elif n == 1:
                    e_prime = (3.0 * e_t - h0) / 2.0
                elif n == 2:
                    e_prime = (23.0 * e_t - 16.0 * h0 + 5.0 * h1) / 12.0
                else:
                    e_prime = (55.0 * e_t - 59.0 * h0 + 37.0 * h1
                               - 9.0 * h2) / 24.0
                x = ddim_step(x, e_prime, ab[j], apb[j], sgb[j], sqb[j])[0]
                h0, h1, h2 = e_t, h0, h1
            return x, h0, h1, h2
        return jax.jit(fn, donate_argnums=(1, 2, 3, 4))

    blocks = []
    p0 = 0
    fns = {}
    for k in sizes:
        pattern = tuple(min(p, 3) for p in range(p0, p0 + k))
        key = (k, pattern)
        if key not in fns:
            fns[key] = make_block(k, pattern)
        consts = tuple(jnp.asarray(c[p0:p0 + k])
                       for c in (ts_seq, ts_next, *tables))
        blocks.append((fns[key], consts))
        p0 += k

    def block_loop(var, x, seg_cond, ctx, rng):
        # distinct buffers: the three history slots are donated, and donation
        # rejects the same buffer appearing twice
        h = [jnp.zeros_like(x) for _ in range(3)]
        for fn, consts in blocks:
            x, *h = fn(var, x, *h, seg_cond, ctx, *consts)
        return x

    return block_loop


def _dpm_blocks(model, cfg, schedule, eval_e, partition, default_unroll):
    """Host-block DPM-Solver++(2M) (counterpart of `core/dpm_solver.py`'s
    scan): only the previous x0 prediction is runtime state; the step sizes
    h_i — and hence every multistep coefficient — are schedule-static."""
    num = cfg.ddim_steps
    T = schedule.num_timesteps
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    t_grid = np.linspace(T - 1, 0, num + 1).round().astype(np.int64)
    alpha = np.sqrt(ac[t_grid])
    sigma = np.sqrt(1.0 - ac[t_grid])
    lam = np.log(alpha) - np.log(sigma)
    h = lam[1:] - lam[:-1]
    r = np.concatenate([[1.0], h[:-1]]) / h      # r_0 unused (first step: D=x0)
    consts_all = [np.asarray(a, np.float64) for a in (
        t_grid[:-1], alpha[:-1], sigma[:-1], alpha[1:], sigma[1:],
        np.expm1(-h), 1.0 + 1.0 / (2.0 * r), 1.0 / (2.0 * r))]

    sizes = partition(num, default_unroll(num))

    def make_block(k: int, first: bool):
        def fn(var, x, x0_prev, seg_cond, ctx, tb, atb, stb, anb, snb,
               emb, c1b, c2b):
            b = x.shape[0]
            for j in range(k):  # static unroll
                ts = jnp.full((b,), tb[j], jnp.int32)
                e = eval_e(var, x, ts, seg_cond, ctx)
                x0 = (x - stb[j] * e.astype(jnp.float32)) / atb[j]
                if first and j == 0:
                    d = x0
                else:
                    d = c1b[j] * x0 - c2b[j] * x0_prev
                x = (snb[j] / stb[j]) * x - anb[j] * emb[j] * d
                x0_prev = x0
            return x, x0_prev
        return jax.jit(fn, donate_argnums=(1, 2))

    blocks = []
    fns = {}
    s0 = 0
    for bi, k in enumerate(sizes):
        key = (k, bi == 0)
        if key not in fns:
            fns[key] = make_block(k, bi == 0)
        consts = tuple(
            jnp.asarray(c[s0:s0 + k],
                        jnp.int32 if ci == 0 else jnp.float32)
            for ci, c in enumerate(consts_all))
        blocks.append((fns[key], consts))
        s0 += k

    def block_loop(var, x, seg_cond, ctx, rng):
        x0_prev = jnp.zeros_like(x)
        for fn, consts in blocks:
            x, x0_prev = fn(var, x, x0_prev, seg_cond, ctx, *consts)
        return x

    return block_loop
