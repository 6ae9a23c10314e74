#!/usr/bin/env python
"""Calibrate `auto:R` refresh placement on a TRAINED flagship (VERDICT r3 #5).

Every placement conclusion so far came from the untrained flagship (bench-time
calibration) or the trained TINY model; drift profiles are model-dependent, so
this tool produces the missing datapoint: train the bench flagship for a few
hundred steps ON CHIP, measure its drift profile (`train/calibrate.py`),
compare the resulting `auto:R` placement + cached-vs-exact PSNR against the
untrained calibration, and save the trained profile for
`STEDM_BENCH_DRIFT_NPY`.

Tunnel-aware: training batches are synthesized ON DEVICE inside one jitted
program (random rectangle layouts + fg/bg colors + texture noise — the same
structured distribution tools/deepcache_quality.py trains on, at flagship
resolution) because staging fresh host batches would crawl at ~30 MB/s H2D.

    python tools/calibrate_flagship.py [--steps 300] [--refreshes 5]
        [--out /tmp/drift_trained.npy]   # TPU job; run under the bench flock
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_device_batch(key, batch: int, patch: int):
    """Structured synthetic batch generated entirely on device (jit this)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lo, hi = patch // 8, patch // 2
    y0x0 = jax.random.randint(k1, (batch, 2), lo, hi)
    hw = jax.random.randint(k2, (batch, 2), hi - lo, hi)
    yy = jnp.arange(patch)[None, :, None]
    xx = jnp.arange(patch)[None, None, :]
    m = ((yy >= y0x0[:, 0, None, None]) & (yy < (y0x0[:, 0] + hw[:, 0])[:, None, None])
         & (xx >= y0x0[:, 1, None, None]) & (xx < (y0x0[:, 1] + hw[:, 1])[:, None, None]))
    seg = jnp.stack([(~m).astype(jnp.float32), m.astype(jnp.float32)], -1)
    colors = jax.random.uniform(k3, (batch, 2, 3), minval=-0.8, maxval=0.8)
    img = jnp.where(m[..., None], colors[:, 0, None, None], colors[:, 1, None, None])
    img = jnp.clip(img + 0.08 * jax.random.normal(k4, img.shape), -1, 1)
    return {"image": img, "segmentation": seg, "style_imgs": img[:, None]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--refreshes", type=int, default=5)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/drift_trained.npy")
    args = ap.parse_args()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from stedm_tpu.core.cache_schedule import positions_from_spec
    from stedm_tpu.core.ddim import DDIMParams
    from stedm_tpu.train.calibrate import measure_cache_drift
    from stedm_tpu.train.host_sampler import host_loop_default, make_host_sample_fn
    from stedm_tpu.train.optim import make_optimizer
    from stedm_tpu.train.steps import (SamplerConfig, create_train_state,
                                       make_sample_fn, make_train_step)

    model, params0, bench_batch, schedule = bench.build_flagship(args.batch)
    patch = bench.PATCH
    base = dict(ddim_steps=args.ddim_steps, eta=0.0, cfg_scale=1.5,
                rescale_phi=0.7, batched_cfg=True, downsample=4)
    n_steps = DDIMParams.create(schedule, args.ddim_steps, 0.0).num_steps

    def drift_of(params, tag):
        d = np.asarray(measure_cache_drift(
            model, schedule, SamplerConfig(**base), params, bench_batch,
            jax.random.PRNGKey(42)))
        pos = positions_from_spec(f"auto:{args.refreshes}", n_steps, d)
        log(f"{tag} drift: " + " ".join(f"{v:.3f}" for v in d))
        log(f"{tag} auto:{args.refreshes} placement: {list(pos)}")
        return d, pos

    def psnr_of(params, pos, tag):
        serving = dict(cache_interval=1, cache_levels=1,
                       cache_schedule=tuple(int(p) for p in pos),
                       cfg_interval=(0.2, 0.8))
        if host_loop_default():
            exact = make_host_sample_fn(model, schedule, SamplerConfig(**base),
                                        unroll=bench.UNROLL)
            cached = make_host_sample_fn(model, schedule,
                                         SamplerConfig(**serving, **base),
                                         unroll=bench.UNROLL)
        else:
            exact = jax.jit(make_sample_fn(model, schedule, SamplerConfig(**base)))
            cached = jax.jit(make_sample_fn(model, schedule,
                                            SamplerConfig(**serving, **base)))
        rng = jax.random.PRNGKey(7)
        cond = {k: bench_batch[k] for k in ("segmentation", "style_imgs")}
        a = np.asarray(bench.warm(exact, params, cond, rng))
        b = np.asarray(bench.warm(cached, params, cond, rng))
        mse = float(np.mean((a - b) ** 2))
        p = 10 * np.log10(4.0 / max(mse, 1e-12))
        log(f"{tag} cached-vs-exact PSNR (composed, cfg window 0.2:0.8): "
            f"{p:.1f} dB")
        return p

    log("=== untrained flagship (the bench-time calibration) ===")
    drift_u, pos_u = drift_of(params0, "untrained")

    log(f"=== training {args.steps} steps at {patch}² batch {args.batch} ===")
    tx = make_optimizer(1e-4, accumulate_grad_batches=1)
    state = create_train_state(params0, tx)
    step = jax.jit(make_train_step(model, schedule, tx), donate_argnums=(0,))
    gen = jax.jit(lambda k: make_device_batch(k, args.batch, patch))
    key = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    state, metrics = step(state, gen(jax.random.fold_in(key, 0)),
                          jax.random.PRNGKey(10))
    log(f"compile+first step {time.perf_counter() - t0:.1f}s, "
        f"loss {float(metrics['loss']):.4f}")
    t0 = time.perf_counter()
    losses = []
    for i in range(1, args.steps):
        state, metrics = step(state, gen(jax.random.fold_in(key, i)),
                              jax.random.fold_in(jax.random.PRNGKey(10), i))
        if i % 50 == 0:
            losses.append(float(metrics["loss"]))
            log(f"step {i}: loss {losses[-1]:.4f} "
                f"({args.batch * i / (time.perf_counter() - t0):.1f} samples/s)")
    final_loss = float(metrics["loss"])
    assert np.isfinite(final_loss), "training diverged"

    log("=== trained flagship calibration ===")
    drift_t, pos_t = drift_of(state.params, "trained")
    np.save(args.out, drift_t)
    log(f"trained drift profile saved to {args.out} "
        f"(use STEDM_BENCH_DRIFT_NPY={args.out})")

    psnr_u = psnr_of(state.params, pos_u, "untrained-placement-on-trained-model")
    psnr_t = psnr_of(state.params, pos_t, "trained-placement-on-trained-model")

    print(json.dumps({
        "metric": "trained-flagship auto:%d calibration" % args.refreshes,
        "train_steps": args.steps,
        "final_loss": round(final_loss, 4),
        "untrained_placement": [int(p) for p in pos_u],
        "trained_placement": [int(p) for p in pos_t],
        "placements_equal": [int(p) for p in pos_u] == [int(p) for p in pos_t],
        "psnr_untrained_placement_db": round(psnr_u, 2),
        "psnr_trained_placement_db": round(psnr_t, 2),
        "drift_out": args.out,
    }))


if __name__ == "__main__":
    main()
