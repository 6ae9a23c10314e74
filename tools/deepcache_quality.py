#!/usr/bin/env python
"""Price the serving mode (cache_interval) on a TRAINED model: PSNR *and* FID.

The bench's untrained-model PSNR is a worst case: random weights make the
trajectory chaotic. Here a tiny STEDM is actually trained on structured
synthetic data (fg/bg colored layouts) until the loss settles, then the exact
sampler (interval 1) is compared against cached intervals two ways:

* per-pixel: PSNR / rel-RMS of cached vs exact on the SAME seeds — measures
  trajectory deviation, not perceptual cost;
* distribution-level: relative FID (`tools/fid.py`'s seeded random-projection
  featurizer) of exact-vs-real and cached-vs-real generated SETS — the metric
  class BASELINE.json actually accepts on. The featurizer is not
  Inception (no egress for weights), so absolute numbers are not comparable to
  published FIDs, but the exact-vs-cached DELTA under the same featurizer is
  meaningful (VERDICT r2 task 2).

    JAX_PLATFORMS=cpu python tools/deepcache_quality.py [--steps 400]
        [--fid_samples 256] [--intervals 2 3 5]

Prints one line per interval: PSNR / rel-RMS / FID vs the exact trajectory's
FID. `tests/test_deepcache_quality.py` runs the same pipeline at toy scale.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build_tiny(patch: int = 32, ch: int = 32):
    from stedm_tpu.models.stedm import STEDM

    return STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=ch,
                         num_res_blocks=1, channel_mult=(1, 4, 8), num_heads=4,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=128, ddconfig=dict(
            double_z=False, z_channels=3, resolution=patch, in_channels=3,
            out_ch=3, ch=ch, ch_mult=[1, 2, 4], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean", style_sampling="nearby", patch_size=patch,
    )


def make_batch(rng: np.random.Generator, patch: int = 32, b: int = 8,
               style_drop: float = 0.0):
    """Structured data: random fg blob, fg/bg base colors + texture noise.

    ``style_drop`` replicates the reference's train-time CFG augmentation
    (flowers_ds.py:62-66): each sample's style set is replaced by the constant
    -2 fill with that probability, so the UNCOND signature is in-distribution
    and the model actually learns a cond/uncond difference — without it the
    tiny pricing model ignores guidance entirely and window pricing has zero
    power (VERDICT r4 weak #3: 117 dB 'identical trajectories')."""
    import jax.numpy as jnp

    seg = np.zeros((b, patch, patch, 2), np.float32)
    img = np.zeros((b, patch, patch, 3), np.float32)
    lo, hi = patch // 8, patch // 2
    for i in range(b):
        y0, x0 = rng.integers(lo, hi, 2)
        h, w = rng.integers(hi - lo, hi, 2)
        m = np.zeros((patch, patch), bool)
        m[y0:y0 + h, x0:x0 + w] = True
        seg[i, ..., 1] = m
        seg[i, ..., 0] = ~m
        fg, bg = rng.uniform(-0.8, 0.8, (2, 3))
        img[i] = np.where(m[..., None], fg, bg)
        img[i] += rng.normal(0, 0.08, (patch, patch, 3))
    style = np.repeat(np.clip(img, -1, 1)[:, None], 1, axis=1)
    if style_drop:
        dropped = rng.uniform(size=b) < style_drop
        style = np.where(dropped[:, None, None, None, None], -2.0, style)
    return {"image": jnp.asarray(np.clip(img, -1, 1)),
            "segmentation": jnp.asarray(seg),
            "style_imgs": jnp.asarray(style)}


def train_tiny(model, steps: int, patch: int = 32, log=print,
               style_drop: float = 0.0):
    import jax
    import jax.numpy as jnp

    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.train.optim import make_optimizer
    from stedm_tpu.train.steps import create_train_state, make_train_step

    rng_np = np.random.default_rng(0)
    batch0 = make_batch(rng_np, patch)
    params = model.init(jax.random.PRNGKey(0), batch0["image"],
                        batch0["segmentation"], batch0["style_imgs"],
                        jnp.zeros((batch0["image"].shape[0],), jnp.int32))["params"]
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    tx = make_optimizer(2e-4, accumulate_grad_batches=1)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, schedule, tx))
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        state, metrics = step(state, make_batch(rng_np, patch,
                                                style_drop=style_drop), key)
        if i % 100 == 0 or i == steps - 1:
            log(f"step {i}: loss {float(metrics['loss']):.4f}")
    return state, schedule


def generate_set(model, schedule, params, *, interval: int = 1, n: int,
                 patch: int = 32, ddim_steps: int = 50, batch: int = 8,
                 seed: int = 1000, positions=None,
                 cfg_interval=None, cfg_scale: float = 1.5) -> np.ndarray:
    """n sampled images in [-1,1] float32, fresh held-out layouts per batch.
    Same layout/noise seeds across intervals so per-pixel deltas are paired.
    ``positions`` (refresh schedule, core/cache_schedule.py) overrides
    ``interval`` for non-uniform serving-mode placement; ``cfg_interval``
    restricts guidance to a (lo_frac, hi_frac) window (arXiv 2404.07724);
    ``cfg_scale`` amplifies the cond/uncond difference (1.0 disables CFG —
    used by the probe's own power check)."""
    import jax

    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    cfg = SamplerConfig(ddim_steps=ddim_steps, eta=0.0, cfg_scale=cfg_scale,
                        rescale_phi=0.7, batched_cfg=True, downsample=4,
                        cache_interval=1 if positions is not None else interval,
                        cache_schedule=(tuple(positions)
                                        if positions is not None else None),
                        cfg_interval=cfg_interval)
    fn = jax.jit(make_sample_fn(model, schedule, cfg))
    out = []
    for bi in range(-(-n // batch)):
        layouts = make_batch(np.random.default_rng(seed + bi), patch, batch)
        imgs = fn(params, {k: v for k, v in layouts.items() if k != "image"},
                  jax.random.PRNGKey(seed + bi))
        out.append(np.asarray(imgs))
    return np.concatenate(out)[:n]


def real_set(n: int, patch: int = 32, seed: int = 5000) -> np.ndarray:
    imgs = [np.asarray(make_batch(np.random.default_rng(seed + i), patch,
                                  8)["image"]) for i in range(-(-n // 8))]
    return np.concatenate(imgs)[:n]


def fid_rp(a: np.ndarray, b: np.ndarray, patch: int = 64,
           dim: int = 128) -> float:
    """Relative FID between two [-1,1] float image sets via the seeded
    random-projection featurizer (self-consistent, not Inception-comparable).

    ``dim`` must sit well below the sample count or the covariance estimate is
    degenerate and the Fréchet term is noise (default 128 for >=256 samples;
    shrink it for smaller sets)."""
    from tools.fid import fid_from_features, random_projection_featurizer

    if min(len(a), len(b)) < 2 * dim:
        dim = max(8, min(len(a), len(b)) // 2)
    feat = random_projection_featurizer(dim=dim, patch=patch)
    to_u8 = lambda x: ((np.clip(x, -1, 1) + 1) * 127.5).astype(np.uint8)
    return fid_from_features(feat(to_u8(a)), feat(to_u8(b)))


def evaluate(model, schedule, params, *, intervals, patch: int = 32,
             ddim_steps: int = 50, fid_samples: int = 256,
             schedules: dict | None = None, cfg_intervals=None,
             cfg_scale: float = 1.5, power_check: bool = False,
             log=print) -> dict:
    """Per-interval quality table vs the exact trajectory: paired PSNR/rel-RMS
    plus set-level FID_rp against the real distribution (interval 1 = exact).
    ``schedules`` maps extra labels to explicit refresh-position tuples
    (non-uniform serving mode) priced the same way.

    ``power_check=True`` adds an 'unguided' row — the SAME seeds sampled with
    CFG off entirely (cfg_scale 1.0) — quantifying how much guidance moves
    this model's trajectories at all. A guidance-window price is only
    meaningful when this row shows a real deviation (low PSNR / nonzero
    rel-RMS); VERDICT r4 weak #3 found the old protocol's window rows at
    117 dB BECAUSE the unguided row would have been ~identical too."""
    exact = generate_set(model, schedule, params, interval=1, n=fid_samples,
                         patch=patch, ddim_steps=ddim_steps,
                         cfg_scale=cfg_scale)
    real = real_set(fid_samples, patch)
    # key 0: the metric's own noise floor — FID_rp between two fresh draws of
    # the REAL distribution; deltas below this are not resolvable
    floor = fid_rp(real, real_set(fid_samples, patch, seed=9000))
    results = {0: {"psnr_db": float("inf"), "rel_rms": 0.0, "fid_rp": floor},
               1: {"psnr_db": float("inf"), "rel_rms": 0.0,
                   "fid_rp": fid_rp(real, exact)}}
    log(f"same-distribution noise floor: FID_rp {floor:.4f}")
    log(f"interval=1 (exact, cfg_scale {cfg_scale}): "
        f"FID_rp {results[1]['fid_rp']:.4f} ({fid_samples} samples vs real)")
    def _price(label, cached):
        mse = float(np.mean((cached - exact) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        rel = np.sqrt(mse) / (np.sqrt(float(np.mean(exact ** 2))) + 1e-12)
        fid = fid_rp(real, cached)
        fid_vs_exact = fid_rp(exact, cached)   # direct set-to-set delta
        results[label] = {"psnr_db": psnr, "rel_rms": rel, "fid_rp": fid,
                          "fid_rp_vs_exact": fid_vs_exact}
        log(f"{label}: PSNR {psnr:.1f} dB, rel-RMS {rel:.4f}, "
            f"FID_rp {fid:.4f} (exact: {results[1]['fid_rp']:.4f}; "
            f"cached-vs-exact {fid_vs_exact:.4f}) "
            f"[trained tiny model, DDIM-{ddim_steps} CFG {cfg_scale}]")

    if power_check:
        _price("unguided", generate_set(model, schedule, params, n=fid_samples,
                                        patch=patch, ddim_steps=ddim_steps,
                                        cfg_scale=1.0))
        p = results["unguided"]["psnr_db"]
        if p > 60.0:
            log(f"WARNING: PROBE POWERLESS — guidance moves trajectories by "
                f"only {p:.1f} dB PSNR; window prices below cannot detect "
                f"harm. Train longer / raise --style_drop / --cfg_scale.")
        else:
            log(f"probe power: guided-vs-unguided {p:.1f} dB PSNR, "
                f"fid_rp_vs_exact {results['unguided']['fid_rp_vs_exact']:.4f}"
                f" — window prices are resolvable against this")

    for interval in intervals:
        _price(interval, generate_set(model, schedule, params,
                                      interval=interval, n=fid_samples,
                                      patch=patch, ddim_steps=ddim_steps,
                                      cfg_scale=cfg_scale))
    for label, positions in (schedules or {}).items():
        _price(label, generate_set(model, schedule, params, n=fid_samples,
                                   patch=patch, ddim_steps=ddim_steps,
                                   positions=positions, cfg_scale=cfg_scale))
    for lo, hi in (cfg_intervals or []):
        # (a) guidance interval alone (exact cache) and (b) composed with the
        # serving default cache_interval=3 — both priced like the cache knobs
        _price(f"cfgint {lo}:{hi}",
               generate_set(model, schedule, params, n=fid_samples, patch=patch,
                            ddim_steps=ddim_steps, cfg_interval=(lo, hi),
                            cfg_scale=cfg_scale))
        _price(f"cfgint {lo}:{hi} + interval 3",
               generate_set(model, schedule, params, n=fid_samples, patch=patch,
                            ddim_steps=ddim_steps, interval=3,
                            cfg_interval=(lo, hi), cfg_scale=cfg_scale))
        # (c) composed with each scheduled placement — the serving frontier
        # combines BOTH levers, so the headline point needs its own pricing
        for label, positions in (schedules or {}).items():
            _price(f"cfgint {lo}:{hi} + {label}",
                   generate_set(model, schedule, params, n=fid_samples,
                                patch=patch, ddim_steps=ddim_steps,
                                positions=positions, cfg_interval=(lo, hi),
                                cfg_scale=cfg_scale))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--intervals", type=int, nargs="+", default=[2, 3, 5])
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--fid_samples", type=int, default=256)
    ap.add_argument("--cfg_intervals", nargs="*", default=[],
                    help="guidance intervals to price as LO:HI fractions "
                         "(arXiv 2404.07724), each alone and composed with "
                         "cache_interval=3 (e.g. 0:0.6 0.1:0.7)")
    ap.add_argument("--schedules", nargs="*", default=[],
                    help="extra non-uniform refresh schedules to price, as "
                         "core/cache_schedule.py specs (e.g. auto:10 quad:13 "
                         "uniform:5); auto:R calibrates drift on the trained "
                         "tiny model")
    ap.add_argument("--cfg_scale", type=float, default=1.5,
                    help="guidance scale for every priced set (the bench "
                         "serving config runs 1.5; higher values amplify the "
                         "cond/uncond difference for a stricter window test)")
    ap.add_argument("--style_drop", type=float, default=0.0,
                    help="train-time style-drop probability (reference "
                         "flowers_ds.py:62-66) — without it the tiny model "
                         "never sees the uncond signature and guidance "
                         "pricing has no power (default 0 reproduces the "
                         "round-3/4 protocol)")
    ap.add_argument("--power_check", action="store_true",
                    help="add an 'unguided' (cfg off) row quantifying how "
                         "much guidance moves this model at all — window "
                         "prices are only meaningful when this deviates")
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    model = build_tiny()
    state, schedule = train_tiny(model, args.steps, log=log,
                                 style_drop=args.style_drop)

    schedules = {}
    if args.schedules:
        from stedm_tpu.core.cache_schedule import positions_from_spec

        drift = None
        if any(s.startswith("auto") for s in args.schedules):
            from stedm_tpu.train.calibrate import measure_cache_drift
            from stedm_tpu.train.steps import SamplerConfig

            calib_cfg = SamplerConfig(ddim_steps=args.ddim_steps, eta=0.0,
                                      cfg_scale=1.5, rescale_phi=0.7,
                                      batched_cfg=True, downsample=4)
            calib_batch = {k: v for k, v in
                           make_batch(np.random.default_rng(77)).items()
                           if k != "image"}
            import jax

            drift = measure_cache_drift(model, schedule, calib_cfg,
                                        state.params, calib_batch,
                                        jax.random.PRNGKey(77))
            log("calibrated drift profile: "
                + " ".join(f"{d:.3f}" for d in drift))
        from stedm_tpu.core.ddim import DDIMParams as _DP

        # the uniform DDIM stride can run more steps than requested (the
        # reference's ragged +1-shift behavior) — size the schedule to the
        # ACTUAL step count
        n_steps = _DP.create(schedule, args.ddim_steps, 0.0).num_steps
        for spec in args.schedules:
            schedules[spec] = positions_from_spec(spec, n_steps, drift)
            log(f"schedule {spec}: refresh positions {list(schedules[spec])}")

    cfg_is = [tuple(float(v) for v in spec.split(":")) for spec in args.cfg_intervals]
    results = evaluate(model, schedule, state.params,
                       intervals=args.intervals, ddim_steps=args.ddim_steps,
                       fid_samples=args.fid_samples, schedules=schedules,
                       cfg_intervals=cfg_is, cfg_scale=args.cfg_scale,
                       power_check=args.power_check)
    import json

    print(json.dumps({str(k): {m: (round(v, 4) if np.isfinite(v) else None)
                               for m, v in r.items()}
                      for k, r in sorted(results.items(), key=lambda kv: str(kv[0]))}))


if __name__ == "__main__":
    main()
