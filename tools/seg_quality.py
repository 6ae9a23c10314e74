#!/usr/bin/env python
"""Price the serving frontier in DOWNSTREAM SEGMENTATION mIoU.

BASELINE.json's acceptance criterion is "FID + downstream-seg mIoU parity";
`tools/deepcache_quality.py` prices the serving approximation in FID_rp only.
This tool measures the OTHER half (VERDICT r3 task 1): the reference's actual
consumption workflow (reference `README.md:34-51` — train diffusion, generate
a synthetic (image, layout) set, train the segmentation net on it, report
IoU on held-out real data; IoU protocol from reference
`modules/segmentation.py:135-160`) run twice — once on an EXACT-sampler
synthetic set and once on the CACHED serving-mode set — and compared.

Protocol (all CPU-capable, tiny scale):
  1. train the tiny STEDM on structured synthetic layouts
     (`deepcache_quality.train_tiny`, same recipe the FID pricing used);
  2. generate paired synthetic sets on fresh layouts: exact (cache off) and
     serving-mode (default: the bench frontier `auto:R` + cfg window),
     keeping each sample's conditioning layout as its segmentation label;
  3. train the real seg machinery (`SegUNet` tiny + `make_seg_train_step`,
     CE+Dice on border-masked logits) on three mixes — real-only,
     real+exact-syn, real+cached-syn — with `--seeds` independent seg
     seeds each;
  4. evaluate foreground IoU / mIoU on held-out real layouts and print a
     per-mix mean±std table plus one JSON line.

Acceptance reading: the cached mix must land within the seed-noise band of
the exact mix (and both at or above real-only — synthetic data should help,
or at least not hurt).

    JAX_PLATFORMS=cpu python tools/seg_quality.py [--steps 400]
        [--syn_samples 256] [--seg_steps 400] [--seeds 3]
        [--schedule auto:5] [--cfg_interval 0.2:0.8]

`tests/test_seg_quality.py` runs the same pipeline at toy scale.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tools.deepcache_quality import build_tiny, make_batch, train_tiny


def generate_labeled_set(model, schedule, params, *, n: int, patch: int = 32,
                         ddim_steps: int = 50, batch: int = 8,
                         seed: int = 1000, positions=None, cfg_interval=None):
    """Like deepcache_quality.generate_set but ALSO returns each sample's
    conditioning layout as its integer segmentation label — the synthetic
    (image, mask) pair the downstream seg net trains on (the reference saves
    exactly this pair, predict_diff.py img_*/seg_* outputs)."""
    import jax

    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    cfg = SamplerConfig(ddim_steps=ddim_steps, eta=0.0, cfg_scale=1.5,
                        rescale_phi=0.7, batched_cfg=True, downsample=4,
                        cache_interval=1,
                        cache_schedule=(tuple(positions)
                                        if positions is not None else None),
                        cfg_interval=cfg_interval)
    fn = jax.jit(make_sample_fn(model, schedule, cfg))
    imgs, segs = [], []
    for bi in range(-(-n // batch)):
        layouts = make_batch(np.random.default_rng(seed + bi), patch, batch)
        out = fn(params, {k: v for k, v in layouts.items() if k != "image"},
                 jax.random.PRNGKey(seed + bi))
        imgs.append(np.asarray(out))
        segs.append(np.argmax(np.asarray(layouts["segmentation"]), -1))
    return (np.concatenate(imgs)[:n],
            np.concatenate(segs)[:n].astype(np.int32))


def real_labeled_set(n: int, patch: int = 32, seed: int = 5000):
    imgs, segs = [], []
    for i in range(-(-n // 8)):
        b = make_batch(np.random.default_rng(seed + i), patch, 8)
        imgs.append(np.asarray(b["image"]))
        segs.append(np.argmax(np.asarray(b["segmentation"]), -1))
    return np.concatenate(imgs)[:n], np.concatenate(segs)[:n].astype(np.int32)


def _tiny_seg_model():
    import jax.numpy as jnp

    from stedm_tpu.models.segformer import SegUNet

    return SegUNet(classes=2, decoder_channels=(16, 12, 8, 8, 8),
                   encoder_config=dict(embed_dims=(8, 12, 16, 24),
                                       depths=(1, 1, 1, 1),
                                       num_heads=(1, 2, 4, 8)),
                   dtype=jnp.float32)


def train_and_eval_seg(train_imgs: np.ndarray, train_segs: np.ndarray,
                       val_imgs: np.ndarray, val_segs: np.ndarray, *,
                       steps: int = 400, batch: int = 8, seed: int = 0,
                       overlap: int = 2, lr: float = 1e-3,
                       log=lambda *a: None) -> dict:
    """One downstream run: train the seg net on (imgs, segs), return IoU on
    the held-out set. Uses the SAME jittable step train_seg.py uses
    (CE+Dice, border-masked — reference modules/segmentation.py:77-98) and
    the same CM->IoU math (metrics.py, reference :135-160)."""
    import jax
    import jax.numpy as jnp
    import optax

    from stedm_tpu.train.seg_steps import create_seg_state, make_seg_train_step
    from stedm_tpu.utils.metrics import calc_iou_scores

    model = _tiny_seg_model()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1,) + train_imgs.shape[1:]), False)
    tx = optax.adamw(lr)
    state = create_seg_state(variables, tx)
    step = jax.jit(make_seg_train_step(model, tx, num_classes=2,
                                       overlap=overlap))
    rng = np.random.default_rng(seed)
    n = len(train_imgs)
    for i in range(steps):
        idx = rng.integers(0, n, batch)
        state, metrics = step(state, jnp.asarray(train_imgs[idx]),
                              jnp.asarray(train_segs[idx]))
        if i % 100 == 0 or i == steps - 1:
            log(f"  seg step {i}: loss {float(metrics['loss']):.4f}")

    apply = jax.jit(lambda v, x: model.apply(v, x, False, mutable=False))
    var = {"params": state.params, "batch_stats": state.batch_stats}
    cm = np.zeros((2, 2), np.int64)
    o = overlap
    for s in range(0, len(val_imgs), batch):
        pred = np.argmax(np.asarray(apply(var, jnp.asarray(val_imgs[s:s + batch]))), -1)
        lbl = val_segs[s:s + batch]
        p, l = pred[:, o:-o, o:-o].ravel(), lbl[:, o:-o, o:-o].ravel()
        np.add.at(cm, (l, p), 1)
    ious = calc_iou_scores(cm)
    return {"iou_bg": float(ious[0]), "iou_fg": float(ious[1]),
            "miou": float(np.mean(ious))}


def run_experiment(*, diff_steps: int = 400, syn_samples: int = 256,
                   seg_steps: int = 400, seeds: int = 3, patch: int = 32,
                   ddim_steps: int = 50, schedule_spec: str = "auto:5",
                   cfg_interval=(0.2, 0.8), real_train: int = 64,
                   val_samples: int = 128, log=print, style_drop: float = 0.0,
                   extra_configs=None) -> dict:
    """Full experiment; returns {mix: {metric: [per-seed values]}} + config.

    ``extra_configs``: additional serving points priced against the SAME
    trained generator / exact set / real sets, as (schedule_spec,
    cfg_interval) tuples — VERDICT r4 task 4 asks for >=2 priced configs and
    the generator training dominates the runtime, so they share one.
    ``style_drop`` trains the generator with the reference's CFG augmentation
    (uncond signature in-distribution — the same upgrade the FID probe got)."""
    import jax

    model = build_tiny(patch)
    state, schedule = train_tiny(model, diff_steps, patch, log=log,
                                 style_drop=style_drop)

    # resolve the serving schedule on THIS trained model (same machinery the
    # bench uses: drift calibration + DP placement)
    from stedm_tpu.core.cache_schedule import positions_from_spec
    from stedm_tpu.core.ddim import DDIMParams
    from stedm_tpu.train.calibrate import measure_cache_drift
    from stedm_tpu.train.steps import SamplerConfig

    n_steps = DDIMParams.create(schedule, ddim_steps, 0.0).num_steps
    all_configs = [(schedule_spec, cfg_interval)] + list(extra_configs or [])
    drift = None
    if any(spec.startswith("auto") for spec, _ in all_configs):
        calib_cfg = SamplerConfig(ddim_steps=ddim_steps, eta=0.0,
                                  cfg_scale=1.5, rescale_phi=0.7,
                                  batched_cfg=True, downsample=4)
        calib_batch = {k: v for k, v in
                       make_batch(np.random.default_rng(77), patch).items()
                       if k != "image"}
        drift = measure_cache_drift(model, schedule, calib_cfg, state.params,
                                    calib_batch, jax.random.PRNGKey(77))
    resolved = []
    for spec, ci in all_configs:
        pos = positions_from_spec(spec, n_steps, drift) if spec else None
        log(f"serving schedule {spec or '(cache off)'}: refresh positions "
            f"{list(pos) if pos is not None else None}, cfg window {ci}")
        resolved.append((spec, ci, pos))
    positions = resolved[0][2] if resolved[0][2] is not None else ()

    log(f"generating {syn_samples}-sample synthetic sets (exact + "
        f"{len(resolved)} cached)...")
    exact_imgs, exact_segs = generate_labeled_set(
        model, schedule, state.params, n=syn_samples, patch=patch,
        ddim_steps=ddim_steps)

    real_imgs, real_segs = real_labeled_set(real_train, patch)
    val_imgs, val_segs = real_labeled_set(val_samples, patch, seed=9000)

    mixes = {
        "real_only": (real_imgs, real_segs),
        "real+exact_syn": (np.concatenate([real_imgs, exact_imgs]),
                           np.concatenate([real_segs, exact_segs])),
    }
    for i, (spec, ci, pos) in enumerate(resolved):
        ci_t = tuple(ci) if ci else None
        c_imgs, c_segs = generate_labeled_set(
            model, schedule, state.params, n=syn_samples, patch=patch,
            ddim_steps=ddim_steps, positions=pos, cfg_interval=ci_t)
        assert np.array_equal(exact_segs, c_segs)  # paired layouts
        label = ("real+cached_syn" if i == 0 else
                 f"real+cached_syn[{spec}|{ci[0]}:{ci[1]}]")
        mixes[label] = (np.concatenate([real_imgs, c_imgs]),
                        np.concatenate([real_segs, c_segs]))
    results = {}
    for mix, (ti, ts) in mixes.items():
        per_seed = {"iou_bg": [], "iou_fg": [], "miou": []}
        for seed in range(seeds):
            r = train_and_eval_seg(ti, ts, val_imgs, val_segs,
                                   steps=seg_steps, seed=seed, log=log)
            for k, v in r.items():
                per_seed[k].append(round(v, 4))
            log(f"{mix} seed {seed}: IoU_fg {r['iou_fg']:.4f} "
                f"mIoU {r['miou']:.4f}")
        results[mix] = per_seed
        log(f"{mix}: IoU_fg {np.mean(per_seed['iou_fg']):.4f} "
            f"+/- {np.std(per_seed['iou_fg']):.4f}, "
            f"mIoU {np.mean(per_seed['miou']):.4f} "
            f"+/- {np.std(per_seed['miou']):.4f}  [{seeds} seeds]")
    # Welch t-test of each cached mix against the exact mix (the acceptance
    # comparison): with >=8 seeds this has actual power, unlike the round-4
    # n=3 run where 'within seed noise' was mostly noise (VERDICT r4 weak #5)
    welch = {}
    try:
        from scipy.stats import ttest_ind

        ref = results["real+exact_syn"]["miou"]
        for mix, r in results.items():
            if mix.startswith("real+cached_syn"):
                t = ttest_ind(ref, r["miou"], equal_var=False)
                welch[mix] = {"t": round(float(t.statistic), 3),
                              "p": round(float(t.pvalue), 4)}
                log(f"Welch vs exact mix — {mix}: t={t.statistic:.3f} "
                    f"p={t.pvalue:.4f} (n={seeds})")
    except Exception as e:  # scipy always in-image; belt and braces
        log(f"welch unavailable: {e!r}")
    return {
        "config": {"diff_steps": diff_steps, "syn_samples": syn_samples,
                   "seg_steps": seg_steps, "seeds": seeds,
                   "ddim_steps": ddim_steps, "schedule": schedule_spec,
                   "refresh_positions": [int(p) for p in positions],
                   "cfg_interval": list(cfg_interval),
                   "style_drop": style_drop,
                   "extra_configs": [[s, list(c)] for s, c in
                                     (extra_configs or [])]},
        "results": results,
        "welch_vs_exact": welch,
        "summary": {mix: {"iou_fg_mean": round(float(np.mean(r["iou_fg"])), 4),
                          "iou_fg_std": round(float(np.std(r["iou_fg"])), 4),
                          "miou_mean": round(float(np.mean(r["miou"])), 4),
                          "miou_std": round(float(np.std(r["miou"])), 4)}
                    for mix, r in results.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400,
                    help="diffusion training steps")
    ap.add_argument("--syn_samples", type=int, default=256)
    ap.add_argument("--seg_steps", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--schedule", default="auto:5",
                    help="serving refresh schedule (bench default auto:5)")
    ap.add_argument("--cfg_interval", default="0.2:0.8")
    ap.add_argument("--style_drop", type=float, default=0.0,
                    help="generator train-time style-drop probability "
                         "(reference flowers_ds.py:62-66)")
    ap.add_argument("--extra_configs", nargs="*", default=[],
                    help="additional serving configs priced against the same "
                         "generator, as SCHEDULE|LO:HI specs "
                         "(e.g. 'auto:8|0.3:0.7' '|0.3:0.7' for window-only)")
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    lo, _, hi = args.cfg_interval.partition(":")
    extras = []
    for spec in args.extra_configs:
        sched, _, window = spec.partition("|")
        wlo, _, whi = window.partition(":")
        extras.append((sched, (float(wlo), float(whi))))
    out = run_experiment(diff_steps=args.steps, syn_samples=args.syn_samples,
                         seg_steps=args.seg_steps, seeds=args.seeds,
                         ddim_steps=args.ddim_steps,
                         schedule_spec=args.schedule,
                         cfg_interval=(float(lo), float(hi)), log=log,
                         style_drop=args.style_drop, extra_configs=extras)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
