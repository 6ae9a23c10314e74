"""End-to-end predict-LOOP probe: what does serving cost with transfers included?

bench.py times the device programs with a 4-byte readback — deliberately
excluding the H2D conditioning upload, the D2H image readback, and PNG
encoding, because through the axon tunnel those transfers (~25-30 MB/s each
way, CLAUDE.md) are terminal artifacts, not model cost. The REAL generation
entry point (predict_diff.py) pays them, so this probe measures the full
per-batch loop exactly as predict_diff runs it:

    host batch build -> H2D (optionally compact uint8/f16) -> sampler programs
    -> device-side uint8 conversion -> D2H readback -> (optional) PNG encode

with predict_diff's one-batch pipeline (dispatch batch k+1 before reading back
batch k) toggleable for A/B (--no-pipeline serializes the loop the way the
round-2 predict loop did).

Run AFTER any bench jobs finish (takes the same /tmp/stedm_bench.lock; this
host has one CPU core and overlapped timing jobs corrupt each other).

Usage:
    flock /tmp/stedm_bench.lock python tools/predict_probe.py            # serving default
    flock /tmp/stedm_bench.lock python tools/predict_probe.py --exact
    ... --no-pipeline / --compact / --png / --batches N

Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=6, help="timed batches")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--exact", action="store_true",
                    help="exact trajectory instead of the serving default")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="serialize readback with compute (pre-round-3 loop)")
    ap.add_argument("--compact", action="store_true",
                    help="H2D uint8 seg indices + f16 style (predict_diff "
                         "+compact_transfer=true)")
    ap.add_argument("--png", action="store_true", help="include PNG encoding")
    args = ap.parse_args()

    from bench import BATCH as _B  # noqa: F401 (import side effects: none)
    from bench import (CACHE_INTERVAL, CACHE_LEVELS, CACHE_SCHEDULE,
                       CFG_INTERVAL, PATCH, STEPS, UNROLL, build_flagship,
                       resolve_serving, warm)
    from stedm_tpu.core.ddim import DDIMParams
    from stedm_tpu.train.host_sampler import host_loop_default, make_host_sample_fn
    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    model, params, dev_batch, schedule = build_flagship(args.batch)
    base = dict(ddim_steps=STEPS, eta=0.0, cfg_scale=1.5, rescale_phi=0.7,
                batched_cfg=True, downsample=4)

    def calibrate():
        from stedm_tpu.train.calibrate import measure_cache_drift

        return measure_cache_drift(model, schedule, SamplerConfig(**base),
                                   params, dev_batch, jax.random.PRNGKey(42))

    if args.exact:
        serving, mode = dict(cache_interval=1, cache_levels=1), "exact"
    else:
        serving, mode = resolve_serving(
            CACHE_SCHEDULE, CACHE_INTERVAL, CACHE_LEVELS, CFG_INTERVAL,
            DDIMParams.create(schedule, STEPS, 0.0).num_steps, calibrate)
    cfg = SamplerConfig(**serving, **base)
    if host_loop_default():
        sample = make_host_sample_fn(model, schedule, cfg, unroll=UNROLL)
    else:
        sample = jax.jit(make_sample_fn(model, schedule, cfg))

    to_u8 = jax.jit(lambda x: ((x + 1.0) * 127.5).astype(jnp.uint8))
    expand = jax.jit(lambda seg_idx, style: {
        "segmentation": jax.nn.one_hot(seg_idx, 2, dtype=jnp.float32),
        "style_imgs": style.astype(jnp.float32)})

    b, p = args.batch, PATCH
    host_rng = np.random.default_rng(0)

    def host_batch(i: int):
        """Fresh host-side conditioning per batch (the loader's role): a random
        rectangular FG layout + uniform style patches, float32 like
        train_diff.batch_to_ldm emits."""
        seg_idx = np.zeros((b, p, p), np.uint8)
        y0 = 32 + (i * 17) % 64
        seg_idx[:, y0:y0 + 96, 40:200] = 1
        one_hot = np.eye(2, dtype=np.float32)[seg_idx]
        style = host_rng.uniform(-1, 1, (b, 1, p, p, 3)).astype(np.float32)
        return one_hot, seg_idx, style

    def h2d(one_hot, seg_idx, style):
        if args.compact:
            return expand(jax.device_put(seg_idx),
                          jax.device_put(style.astype(np.float16)))
        return {"segmentation": jax.device_put(one_hot),
                "style_imgs": jax.device_put(style)}

    def flush(imgs_dev) -> int:
        imgs = np.asarray(imgs_dev)  # D2H (uint8)
        n_bytes = 0
        if args.png:
            from PIL import Image

            for row in imgs:
                buf = io.BytesIO()
                Image.fromarray(row).save(buf, format="PNG")
                n_bytes += buf.tell()
        return n_bytes or imgs.nbytes

    rng = jax.random.PRNGKey(0)

    # warm every program (compile): one full iteration end to end
    oh, si, st = host_batch(0)
    warm(lambda: flush(to_u8(sample(params, h2d(oh, si, st),
                                    jax.random.fold_in(rng, 999)))))

    t0 = time.perf_counter()
    pending = None
    for i in range(args.batches):
        oh, si, st = host_batch(i + 1)
        imgs_dev = to_u8(sample(params, h2d(oh, si, st),
                                jax.random.fold_in(rng, i)))
        if args.no_pipeline:
            flush(imgs_dev)
        else:
            if pending is not None:
                flush(pending)
            pending = imgs_dev
    if pending is not None:
        flush(pending)
    dt = time.perf_counter() - t0

    ips = args.batch * args.batches / dt
    print(json.dumps({
        "metric": "end-to-end predict-loop throughput (transfers included)",
        "value": round(ips, 4), "unit": "images/sec/chip", "mode": mode,
        "pipeline": not args.no_pipeline, "compact_transfer": args.compact,
        "png": args.png, "batches": args.batches, "batch": args.batch,
        "seconds_per_batch": round(dt / args.batches, 4),
    }))


if __name__ == "__main__":
    main()
