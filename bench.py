"""Benchmark: 256^2 DDIM-50 CFG sampling throughput, images/sec/chip.

Runs the flagship (landscape-config) STEDM sampler on the attached TPU chip:
50 scanned DDIM steps with batched cond/uncond classifier-free guidance
(2 U-Net evaluations/step fused into one call) + one VQ-f4 decode per image,
bf16 compute. Prints ONE JSON line (stdout); supporting numbers — the exact
-trajectory throughput with the serving-mode cache off, and the cached-vs-exact
output deviation — go to stderr.

The headline number uses the framework's serving mode: cross-step deep-feature
reuse (DeepCache-style) with drift-calibrated non-uniform refresh placement
(`cache_schedule=auto:5` — per-step trunk drift is measured on THIS model at
bench time and 5 refreshes are placed by exact DP, `core/cache_schedule.py`)
composed with a guidance window (`cfg_interval=(0.35, 0.65)`, arXiv 2404.07724
— CFG only on the middle 30% of the trajectory; outside it the uncond half of
the shared-encoder fan-out is skipped). Both knobs are priced at the distribution
level on a trained model (BASELINE.md round-3 tables: cached-vs-exact FID_rp
~100x below the metric's same-distribution noise floor, for the composed
configuration too). Same task, same model, same step count as the reference
pipeline (which runs two fresh full U-Net passes per step, reference
ddim.py:177-178); `vs_baseline`'s denominator is still derived from the FULL
reference-equivalent FLOPs, so the speedup from skipping work is exactly what
it claims to be, and the JSON line always carries the exact-trajectory numbers
(`exact_value`, `exact_vs_baseline`) alongside the serving-mode headline.

``vs_baseline`` is measured throughput divided by an analytic A100 estimate
(BASELINE.md: the reference repo publishes no numbers, so the A100 bound is
FLOPs-derived): per-image FLOPs are taken from XLA's cost analysis of the same
jitted programs, and the A100 reference rate assumes 312 TFLOP/s dense bf16 at 40%
MFU — generous for the reference's unfused eager pipeline with two separate U-Net
calls per step (reference ddim.py:177-178). ``vs_baseline_realistic`` divides by
the realistic bound instead (TF32 convs — torch's actual default for the
reference's plain-fp32 pipeline — 156 TF/s peak at the same MFU).

Serialization: this host has ONE CPU core, so bench.py acquires
/tmp/stedm_bench.lock itself (override path: STEDM_BENCH_LOCK_PATH; wait bound:
STEDM_BENCH_LOCK_TIMEOUT, default 1800 s). Do NOT wrap bench.py in an outer
`flock` — the child would spin against the parent's lock for the full timeout
and then run unserialized anyway. A sweep/batch script that already holds the
flock and serializes its children must export STEDM_BENCH_LOCK_HELD=1 instead.
The JSON line carries the outcome in its ``lock`` field ("held" / "inherited" /
"unserialized") so a driver can reject numbers from an unserialized run.

Critical-path budget (VERDICT r4 task 1 — BENCH_r04.json was rc=124 because
slow tunnel work sat between the timing rounds and the JSON print): everything
slow is resolved BEFORE the timed section and served from committed assets —
the `auto:R` drift profile loads from tools/bench_assets/
drift_untrained_flagship.npy (bench-time calibration is opt-in via
STEDM_BENCH_CALIBRATE=1; STEDM_BENCH_DRIFT_NPY still points at a checkpoint
-specific profile) and the analytic-baseline FLOPs load from tools/
bench_assets/flops_cache.json (recompute + refresh with STEDM_BENCH_RECOST=1;
a cache miss computes before timing, never after). After the last timing
round the only remaining work is arithmetic and the JSON print.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeated bench runs skip the (remote) XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("STEDM_BENCH_BATCH", 8))
PATCH = 256
STEPS = 50
# serving mode, uniform-interval knob: refresh the deep trunk every Nth step.
# Used when STEDM_BENCH_SCHEDULE is empty; priced in relative FID on a trained
# model (BASELINE.md round-3 serving-quality table).
CACHE_INTERVAL = int(os.environ.get("STEDM_BENCH_INTERVAL", 3))
CACHE_LEVELS = int(os.environ.get("STEDM_BENCH_LEVELS", 1))
# non-uniform refresh placement (core/cache_schedule.py spec, e.g. "quad:13",
# "uniform:5", "0,3,8,...", or "auto:R" to calibrate drift on this model);
# empty = uniform every CACHE_INTERVAL steps. Default auto:5 — the certified
# frontier schedule (BASELINE.md: 37.29 img/s composed with the 0.2:0.8 window
# in round 3; 38.73 with the round-4 0.3:0.7 window; 41.54 with the round-5
# 0.35:0.65 default below — all priced, trained-model cached-vs-exact FID_rp
# ≥1 order of magnitude below the metric's same-distribution noise floor).
# Falls back to uniform CACHE_INTERVAL if calibration fails.
CACHE_SCHEDULE = os.environ.get("STEDM_BENCH_SCHEDULE", "auto:5")
# guidance interval (arXiv 2404.07724, core/ddim.py:ddim_sample_guided), e.g.
# "0:0.6": CFG only on that fraction of the trajectory; outside it the uncond
# half of the shared-encoder fan-out is skipped. Empty = guide every step
# (the reference behavior). Composes with the cache knobs above. The
# 0.35:0.65 default (middle 30% guided) measured 41.54 img/s solo (round 4,
# priced composed FID_rp 0.0008 — 5.8x under budget) and was confirmed by the
# round-5 POWERED probe (style-drop-trained pricing model, cfg_scale 4.0,
# with a guided-vs-unguided power row bounding the total guidance effect at
# 53.6 dB / FID_rp 0.0000 — any window's harm is bounded by that; composed
# 0.35:0.65 and 0.3:0.7 price identically at 0.0009). BASELINE.md round-5;
# artifact tools/bench_assets/pricing/r5_power_cfg4_styledrop.json.
CFG_INTERVAL = os.environ.get("STEDM_BENCH_CFG_INTERVAL", "0.35:0.65")
# host-sampler steps per dispatched block. Swept on-chip (2026-08-17):
# unroll 10 / batch 8 won — exact 7.97 img/s, serving 18.05 (unroll 5:
# 7.94/17.97; batch 16: 7.77/17.87 — compute-bound beyond batch 8).
UNROLL = int(os.environ.get("STEDM_BENCH_UNROLL", 10)) or None
A100_BF16_FLOPS = 312e12
A100_TF32_FLOPS = 156e12  # torch's default conv math for the reference's fp32 pipeline
A100_MFU = 0.40

# ---- serving-mode quality certificate (VERDICT r3 task 7) -------------------
# The written budget (BASELINE.md "Budget and default" + the round-3
# default-change criteria): the serving config's cached-vs-exact FID_rp on the
# trained tiny model must stay at least an order of magnitude below the
# metric's own same-distribution noise floor. The pricing runs are offline
# (tools/deepcache_quality.py, 256 samples/set); this table pins the measured
# numbers for every priced (schedule, interval, cfg_interval) point at
# cache_levels=1 so the bench JSON carries its own quality certificate instead
# of pointing at BASELINE.md prose. An UNPRICED config gets
# quality_budget_pass=false — run the pricing protocol before trusting it.
FID_NOISE_FLOOR = 0.0466      # real-vs-real fresh draws, same featurizer
FID_BUDGET = FID_NOISE_FLOOR / 10.0
PRICED_FID_RP = {
    # (cache_schedule_spec, cache_interval, cfg_interval_str) -> FID_rp
    ("", 2, ""): 0.0002, ("", 3, ""): 0.0004, ("", 5, ""): 0.0005,
    ("auto:10", 0, ""): 0.0005, ("auto:13", 0, ""): 0.0004,
    ("auto:17", 0, ""): 0.0003, ("quad:13", 0, ""): 0.0005,
    ("", 3, "0:0.6"): 0.0004, ("", 3, "0.2:0.8"): 0.0003,
    ("", 3, "0.4:1"): 0.0004,
    ("auto:8", 0, "0.2:0.8"): 0.0005, ("auto:7", 0, "0.2:0.8"): 0.0006,
    ("auto:6", 0, "0.2:0.8"): 0.0006, ("auto:5", 0, "0.2:0.8"): 0.0008,
    # round-4 pricing (same protocol, 2026-08-20): tighter windows
    ("", 3, "0.3:0.7"): 0.0004, ("auto:5", 0, "0.3:0.7"): 0.0007,
    ("", 3, "0.35:0.65"): 0.0004, ("auto:5", 0, "0.35:0.65"): 0.0008,
    # cfg window alone (cache off) measured 0.0000 for every tested window
    ("", 1, "0:0.6"): 0.0, ("", 1, "0.2:0.8"): 0.0, ("", 1, "0.2:1"): 0.0,
    ("", 1, "0.4:1"): 0.0, ("", 1, "0.3:0.7"): 0.0,
    ("", 1, "0.35:0.65"): 0.0,
}


def quality_certificate(schedule_spec: str, cache_interval: int,
                        cache_levels: int, cfg_interval_str: str) -> dict:
    """Self-contained quality fields for the bench JSON line.

    Looks the resolved serving config up in the offline pricing table
    (BASELINE.md round-3, trained tiny model). `fid_rp` is None — and
    `quality_budget_pass` False — for configurations the pricing protocol has
    never run on; levels>1 points were priced only at the FID level
    ("below noise floor", no headline default uses them) so they also report
    unpriced here."""
    key = (schedule_spec, 0 if schedule_spec else cache_interval,
           cfg_interval_str)
    fid = PRICED_FID_RP.get(key) if cache_levels == 1 else None
    exact = (not schedule_spec and cache_interval <= 1
             and not cfg_interval_str)
    return {
        "fid_noise_floor": FID_NOISE_FLOOR,
        "fid_budget": round(FID_BUDGET, 5),
        "cached_vs_exact_fid_rp": fid,
        "quality_budget_pass": bool(exact or (fid is not None
                                              and fid < FID_BUDGET)),
        "quality_pricing": ("exact reference trajectory" if exact else
                            "unpriced — run tools/deepcache_quality.py"
                            if fid is None else
                            "tools/deepcache_quality.py, trained tiny model, "
                            "256 samples/set (BASELINE.md round-3)"),
    }


# committed critical-path assets (tools/save_bench_assets.py, VERDICT r4 task 1)
_ASSETS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tools", "bench_assets")
DEFAULT_DRIFT_NPY = os.path.join(_ASSETS_DIR, "drift_untrained_flagship.npy")
FLOPS_CACHE_PATH = os.path.join(_ASSETS_DIR, "flops_cache.json")


def warm(fn, *args, attempts=4):
    # the remote-compile tunnel drops long-running compile requests
    # ("Broken pipe" after ~25-30 min); retrying re-issues the request and
    # can complete against server-side compile progress/cache
    for i in range(attempts):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if i == attempts - 1 or "remote_compile" not in str(e):
                raise
            print(f"remote compile dropped (attempt {i + 1}), retrying",
                  file=sys.stderr)
            time.sleep(20)


def build_flagship(batch: int = BATCH):
    """Flagship landscape-config model + on-device params + a bench batch.

    Shared with the diagnostic probes under tools/ so every on-chip timing
    measures the exact same model the headline bench does. Returns
    ``(model, params, batch_dict, schedule)``."""
    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.models.stedm import STEDM

    model = STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=128,
                         num_res_blocks=2, channel_mult=(1, 4, 8), num_heads=8,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=8192, ddconfig=dict(
            double_z=False, z_channels=3, resolution=PATCH, in_channels=3, out_ch=3,
            ch=128, ch_mult=[1, 2, 4], num_res_blocks=2, attn_resolutions=[],
            dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean",
        style_sampling="nearby",
        patch_size=PATCH,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    batch_dict = {
        "segmentation": jnp.zeros((batch, PATCH, PATCH, 2), jnp.float32).at[..., 0].set(1.0),
        "style_imgs": jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (batch, 1, PATCH, PATCH, 3)),
            jnp.float32),
    }
    init_img = jnp.zeros((batch, PATCH, PATCH, 3), jnp.float32)
    params = warm(model.init, rng, init_img, batch_dict["segmentation"],
                  batch_dict["style_imgs"], jnp.zeros((batch,), jnp.int32))["params"]
    # zero-init output convs would NaN the CFG rescale on an untrained model
    params = jax.tree_util.tree_map(
        lambda p: p + 0.005 if p.ndim == 4 else p, params)
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    return model, params, batch_dict, schedule


def resolve_serving(schedule_spec: str, cache_interval: int, cache_levels: int,
                    cfg_interval_str: str, n_steps: int, calibrate=None,
                    log=lambda m: print(m, file=sys.stderr)):
    """Resolve the serving-mode SamplerConfig kwargs + the mode label from the
    env knobs. The bench's JSON line is the driver's durable record, so every
    branch degrades instead of dying: a failing schedule spec (calibration
    error, bad spec string) falls back to the uniform interval, a malformed
    guidance window is dropped. ``calibrate()`` lazily produces the drift
    profile for ``auto:R`` specs. Unit-tested in tests/test_bench_config.py."""
    serving = dict(cache_interval=cache_interval, cache_levels=cache_levels)
    mode = f"deepcache_interval_{cache_interval}_levels_{cache_levels}"
    if schedule_spec:
        from stedm_tpu.core.cache_schedule import positions_from_spec

        try:
            drift = None
            if schedule_spec.startswith("auto"):
                drift = calibrate()
                log("calibrated drift: " + " ".join(f"{d:.3f}" for d in drift))
            pos = positions_from_spec(schedule_spec, n_steps, drift)
            log(f"cache schedule {schedule_spec}: {len(pos)} refreshes at "
                f"{list(pos)}")
            serving = dict(cache_interval=1, cache_levels=cache_levels,
                           cache_schedule=pos)
            mode = (f"deepcache_schedule_{schedule_spec}_levels_{cache_levels}"
                    f"_refreshes_{len(pos)}")
        except Exception as e:
            log(f"cache schedule {schedule_spec} failed ({e!r}); "
                f"falling back to uniform interval {cache_interval}")
    elif cache_interval <= 1:
        mode = "exact"
    if cfg_interval_str:
        # applies to the SERVING config only — `exact_value` stays the
        # reference-equivalent trajectory (guidance on every step)
        try:
            lo_s, _, hi_s = cfg_interval_str.partition(":")
            serving = dict(serving, cfg_interval=(float(lo_s), float(hi_s)))
            mode += f"_cfgint_{lo_s}_{hi_s}"
        except Exception as e:
            log(f"cfg interval {cfg_interval_str!r} unparseable ({e!r}); "
                f"guiding every step")
    return serving, mode


def main() -> None:
    from stedm_tpu.train.host_sampler import host_loop_default, make_host_sample_fn
    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    model, params, batch, schedule = build_flagship(BATCH)
    rng = jax.random.PRNGKey(0)
    base = dict(ddim_steps=STEPS, eta=0.0, cfg_scale=1.5, rescale_phi=0.7,
                batched_cfg=True, downsample=4)

    calib_src = ["none"]

    def calibrate():
        # resolution order (VERDICT r4 task 1 — calibration must not sit on
        # the bench critical path):
        #   1. STEDM_BENCH_DRIFT_NPY: an explicit pre-measured profile (e.g.
        #      from a trained checkpoint via tools/calibrate_flagship.py);
        #   2. STEDM_BENCH_CALIBRATE=1: the old bench-time calibration on the
        #      untrained in-process flagship (49 eps evaluations — minutes
        #      through the remote tunnel), now opt-in;
        #   3. the committed default profile (same model/inputs as 2, measured
        #      once on the real chip by tools/save_bench_assets.py).
        # The JSON's `calibration` field records which one ran.
        drift_npy = os.environ.get("STEDM_BENCH_DRIFT_NPY")
        if drift_npy:
            calib_src[0] = f"pre-measured drift profile ({drift_npy})"
            return np.load(drift_npy)
        if (os.environ.get("STEDM_BENCH_CALIBRATE") != "1"
                and os.path.exists(DEFAULT_DRIFT_NPY)):
            calib_src[0] = ("committed default drift profile "
                            "(tools/bench_assets/drift_untrained_flagship.npy,"
                            " untrained flagship, measured on-chip by "
                            "tools/save_bench_assets.py)")
            return np.load(DEFAULT_DRIFT_NPY)
        from stedm_tpu.train.calibrate import measure_cache_drift

        calib_src[0] = "bench-time calibration on the untrained in-process flagship"
        return measure_cache_drift(model, schedule, SamplerConfig(**base),
                                   params, batch, jax.random.PRNGKey(42))

    from stedm_tpu.core.ddim import DDIMParams

    serving, mode = resolve_serving(
        CACHE_SCHEDULE, CACHE_INTERVAL, CACHE_LEVELS, CFG_INTERVAL,
        DDIMParams.create(schedule, STEPS, 0.0).num_steps, calibrate)
    if host_loop_default() and os.environ.get("STEDM_BENCH_SCAN", "") in (
            "", "0", "false", "False"):
        # host-driven block sampler (stedm_tpu/train/host_sampler.py): same
        # per-step math as the scanned program, measured FASTER on the axon
        # terminal (exact 7.97 vs 6.4 img/s) and ~20x cheaper to compile;
        # STEDM_BENCH_SCAN=1 forces the scanned path for A/B
        sample_exact = make_host_sample_fn(model, schedule, SamplerConfig(**base),
                                           unroll=UNROLL)
        sample = make_host_sample_fn(
            model, schedule, SamplerConfig(**serving, **base), unroll=UNROLL)
    else:
        sample_exact = jax.jit(make_sample_fn(model, schedule,
                                              SamplerConfig(**base)))
        sample = jax.jit(make_sample_fn(
            model, schedule, SamplerConfig(**serving, **base)))

    # analytic A100 baseline — resolved BEFORE the timed section so nothing
    # slow stands between the last timing round and the JSON print
    # (BENCH_r04.json died exactly there: rc=124, parsed=null)
    flops_per_image, flops_src = resolve_flops(model, params, batch)
    baseline = A100_BF16_FLOPS * A100_MFU / flops_per_image
    print(f"analytic baseline: {flops_per_image / 1e12:.3f} TF/image "
          f"-> {baseline:.3f} img/s A100-bf16 bound ({flops_src})",
          file=sys.stderr)

    mean = jax.jit(lambda x: x.mean())

    def timed(fn, n_iters=6, reps=None):
        # timing honesty on the remote-execution tunnel: block_until_ready can
        # return before the program finishes there (measured up to 1.6x
        # inflation), so the clock stops on a 4-byte host readback that DEPENDS
        # on every iteration's output (scalar means summed) — true completion,
        # no image-transfer overhead in the measurement.
        #
        # BEST-OF-REPS: the terminal's host/tunnel jitter is one-sided (a
        # stall can only slow a run, never speed it) and large — the same
        # auto:6 serving program measured 26.1 and 35.7 img/s in two
        # serialized, control-healthy runs (2026-08-19). One timing round is
        # therefore not a trustworthy record; the max over `reps` rounds is
        # the closest observable to the true rate. All rounds go to stderr
        # and the JSON (`value_reps`) so the spread itself is on record.
        reps = reps or int(os.environ.get("STEDM_BENCH_REPS", 3))
        img = warm(fn, params, batch, rng)    # warmup / compile (with retry)
        float(mean(img))                       # full sync
        rates = []
        for r in range(reps):
            t0 = time.perf_counter()
            means = [mean(fn(params, batch, jax.random.fold_in(rng, 1000 * r + i)))
                     for i in range(n_iters)]
            float(jnp.stack(means).sum())
            dt = time.perf_counter() - t0
            rates.append(BATCH * n_iters / dt)
        print("timing rounds (img/s): "
              + " ".join(f"{v:.3f}" for v in rates), file=sys.stderr)
        return max(rates), img, rates

    # optional xprof trace of the timed region (STEDM_TRACE_DIR=/tmp/xprof):
    # view with tensorboard/xprof; no-op when unset
    from stedm_tpu.utils.report import profile_trace

    with profile_trace(os.environ.get("STEDM_TRACE_DIR")):
        imgs_per_sec, img_cached, serving_reps = timed(sample)
        exact_ips, img_exact, exact_reps = timed(sample_exact)
    # deviation of the serving mode from the exact reference trajectory ([-1,1] px)
    mse = float(jnp.mean((img_cached - img_exact) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    print(f"exact-trajectory (cache off): {exact_ips:.3f} img/s; "
          f"cached-vs-exact PSNR {psnr:.1f} dB ({mode})",
          file=sys.stderr)
    # JSON line immediately — everything below this point is arithmetic
    print(json.dumps(assemble_record(
        imgs_per_sec=imgs_per_sec, exact_ips=exact_ips, baseline=baseline,
        psnr=psnr, mode=mode, serving=serving, calibration=calib_src[0],
        serving_reps=serving_reps, exact_reps=exact_reps,
        schedule_spec=CACHE_SCHEDULE, cache_interval=CACHE_INTERVAL,
        cache_levels=CACHE_LEVELS, cfg_interval_str=CFG_INTERVAL,
        flops_source=flops_src)), flush=True)


def resolve_flops(model, params, batch) -> tuple[float, str]:
    """Per-image reference-equivalent FLOPs for the analytic A100 baseline.

    XLA cost_analysis counts a scan body ONCE, so the per-step eps call and
    the VQ decode are costed separately and scaled by the step count. The
    committed sidecar ``tools/bench_assets/flops_cache.json`` (written on the
    real chip by tools/save_bench_assets.py) serves the numbers with zero
    compiles; on a miss — or with STEDM_BENCH_RECOST=1 — the two cost-analysis
    compiles run HERE, before the timed section, and refresh the sidecar.
    Never raises: falls back to the hand estimate (~0.17 TF/U-Net pass x 100
    passes + decode) so the JSON line always prints. Returns
    ``(flops_per_image, provenance_string)``."""
    key = f"flagship_b{BATCH}_p{PATCH}"
    cache: dict = {}
    try:
        with open(FLOPS_CACHE_PATH) as f:
            cache = json.load(f)
    except Exception:
        cache = {}
    if os.environ.get("STEDM_BENCH_RECOST") != "1" and key in cache:
        ent = cache[key]
        per_img = (STEPS * float(ent["eps_flops"])
                   + float(ent["dec_flops"])) / BATCH
        return per_img, f"committed sidecar flops_cache.json[{key}]"

    def _flops(fn, *args) -> float:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    try:
        var = {"params": params}
        seg_cond = jax.jit(lambda v, s: model.apply(v, s, method=model.cond_encode))(
            var, batch["segmentation"])
        style = jax.jit(lambda v, s: model.apply(v, s, method=model.style_encode))(
            var, batch["style_imgs"])
        z = jnp.zeros((BATCH, PATCH // 4, PATCH // 4, 3), jnp.float32)
        t = jnp.zeros((2 * BATCH,), jnp.int32)
        eps_flops = _flops(
            lambda v, x, t_, sc, st: model.apply(
                v, jnp.concatenate([x, x]), t_, jnp.concatenate([sc, sc]),
                jnp.concatenate([st, st]), method=model.eps),
            var, z, t, seg_cond, style)
        dec_flops = _flops(
            lambda v, x: model.apply(v, x, method=model.decode_first_stage), var, z)
        cache[key] = {"eps_flops": eps_flops, "dec_flops": dec_flops,
                      "backend": jax.default_backend()}
        try:
            os.makedirs(_ASSETS_DIR, exist_ok=True)
            with open(FLOPS_CACHE_PATH, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except OSError:
            pass
        return ((STEPS * eps_flops + dec_flops) / BATCH,
                "cost-analysis computed this run (sidecar refreshed)")
    except Exception as e:
        return (0.17e12 * 2 * STEPS + 0.4e12,
                f"hand estimate (cost analysis failed: {e!r})")


def assemble_record(*, imgs_per_sec: float, exact_ips: float, baseline: float,
                    psnr: float, mode: str, serving: dict, calibration: str,
                    serving_reps, exact_reps, schedule_spec: str | None = None,
                    cache_interval: int | None = None,
                    cache_levels: int | None = None,
                    cfg_interval_str: str | None = None,
                    flops_source: str | None = None) -> dict:
    """The machine-readable-honest bench record (VERDICT r2 weak #3, r3 task
    7): the headline `value` is the serving mode, so the JSON itself carries
    the mode label, the exact-reference-trajectory numbers, the resolved
    refresh placement + calibration provenance, BOTH baseline bounds
    (optimistic bf16 + realistic TF32), and its own quality certificate —
    stderr/BASELINE.md prose are not the durable record. Schema-tested in
    tests/test_bench_config.py."""
    # realistic reference bound: same FLOPs, TF32 conv peak (BASELINE.md
    # "Analytic A100 reference bounds") — the multiple the reference's actual
    # (plain-fp32 torch) pipeline would concede
    baseline_realistic = baseline * (A100_TF32_FLOPS / A100_BF16_FLOPS)

    # quality certificate for the RESOLVED config (resolve_serving may have
    # fallen back from a failing schedule spec). The requested specs arrive as
    # explicit arguments (ADVICE r4: do not re-read module globals — callers
    # like tests pass non-global specs through resolve_serving); the None
    # defaults keep old call sites working by falling back to the env globals.
    schedule_spec = CACHE_SCHEDULE if schedule_spec is None else schedule_spec
    cache_interval = CACHE_INTERVAL if cache_interval is None else cache_interval
    cache_levels = CACHE_LEVELS if cache_levels is None else cache_levels
    cfg_interval_str = (CFG_INTERVAL if cfg_interval_str is None
                        else cfg_interval_str)
    r_spec = schedule_spec if "cache_schedule" in serving else ""
    r_cfg = cfg_interval_str if "cfg_interval" in serving else ""
    r_interval = 0 if r_spec else serving.get("cache_interval", cache_interval)
    cert = quality_certificate(r_spec, r_interval, cache_levels, r_cfg)

    return {
        "metric": "256x256 DDIM-50 CFG sampling throughput",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline, 4),
        "vs_baseline_realistic": round(imgs_per_sec / baseline_realistic, 4),
        "mode": mode,
        "exact_value": round(exact_ips, 4),
        "exact_vs_baseline": round(exact_ips / baseline, 4),
        "exact_vs_baseline_realistic": round(exact_ips / baseline_realistic, 4),
        "cached_vs_exact_psnr_db": round(psnr, 2),
        "refresh_positions": [int(p) for p in serving["cache_schedule"]]
                             if "cache_schedule" in serving else None,
        "calibration": calibration,
        # provenance of the analytic-baseline FLOPs (committed sidecar /
        # computed-this-run / hand estimate)
        "flops_source": flops_source,
        **cert,
        # all timing rounds (best-of wins the headline): the tunnel's
        # one-sided host jitter makes single rounds untrustworthy
        "value_reps": [round(v, 4) for v in serving_reps],
        "exact_value_reps": [round(v, 4) for v in exact_reps],
        # serialization outcome ("held"/"inherited"/"unserialized"/
        # "not-acquired"): numbers from an unserialized run on this 1-core
        # host are suspect
        "lock": LOCK_STATUS[0],
    }


# set by __main__ before main() runs; "not-acquired" means main() was called
# as a library function (tests) without going through the lock
LOCK_STATUS = ["not-acquired"]


def _acquire_bench_lock(timeout_s: float | None = None,
                        path: str | None = None):
    """Hold the bench flock for the duration of the bench.

    This host has ONE CPU core; an overlapping measurement job corrupts the
    host-latency-bound dispatch timing (CLAUDE.md). The sweep/recert scripts
    already serialize on this flock — acquiring it here too protects ad-hoc
    and driver-launched `python bench.py` runs. Do NOT wrap bench.py in an
    outer `flock` utility (the child would spin against the parent for the
    whole timeout); a parent that already holds the lock exports
    STEDM_BENCH_LOCK_HELD=1. Bounded wait: if another holder won't release
    within `timeout_s` (env STEDM_BENCH_LOCK_TIMEOUT, default 1800 s),
    proceed with a loud warning rather than stalling the driver forever —
    the "unserialized" status then travels in the JSON line so the numbers
    can't be silently ingested as clean.

    Returns ``(fh_or_None, status)`` with status in {"held", "inherited",
    "unserialized"}. Lock path: `path` arg, else STEDM_BENCH_LOCK_PATH, else
    /tmp/stedm_bench.lock (parameterized so tests never touch the real lock).
    """
    import fcntl

    if timeout_s is None:
        timeout_s = float(os.environ.get("STEDM_BENCH_LOCK_TIMEOUT", 1800.0))
    path = path or os.environ.get("STEDM_BENCH_LOCK_PATH",
                                  "/tmp/stedm_bench.lock")
    if os.environ.get("STEDM_BENCH_LOCK_HELD") == "1":
        # a parent sweep/batch script already holds the flock and serializes
        # its children itself — re-acquiring here would deadlock against the
        # inherited lock (flock owners are open-file-descriptions, so a fresh
        # open() in the child CONFLICTS with the parent's)
        return None, "inherited"
    fh = open(path, "w")
    deadline = time.time() + timeout_s
    while True:
        try:
            fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return fh, "held"  # held until process exit
        except OSError:
            if time.time() >= deadline:
                print(f"WARNING: {path} still held after "
                      f"{timeout_s:.0f}s — proceeding UNSERIALIZED; treat "
                      "this run's timings as suspect", file=sys.stderr)
                return fh, "unserialized"
            time.sleep(5.0)


if __name__ == "__main__":
    _lock, LOCK_STATUS[0] = _acquire_bench_lock()
    main()
