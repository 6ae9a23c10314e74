"""On-chip per-block diagnosis of the composed schedule+cfg-interval slowdown.

Three independent on-chip runs (one contaminated, two clean/serialized —
/tmp/sweep_clean.log 2026-08-18) measured the COMPOSED serving config
(`cache_schedule=auto:R` + `cfg_interval=0.2:0.8`) at 4.3-4.6 img/s — slower
than the exact trajectory (7.96) — while schedule-alone runs 21-25 img/s and
uniform-interval+cfg-window runs 20.6. The composed block programs do strictly
LESS device math (unguided steps run at batch B instead of the 2B CFG fan-out),
so something per-program is pathological.

This probe builds the exact flagship host-block samplers bench.py builds
(same positions as the clean run's auto:10 calibration, passed explicitly so
no re-calibration noise enters) and:

  1. reproduces the whole-trajectory throughput for each config;
  2. re-runs each with STEDM_HOST_BLOCK_TIMING=1 so the host sampler prints
     per-block device times (train/host_sampler.py:block_loop) — localizing
     WHICH block program eats the time.

Run serialized (1-core host): `flock /tmp/stedm_bench.lock python tools/block_probe.py`.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the compile cache dir on import)
from stedm_tpu.train.host_sampler import make_host_sample_fn  # noqa: E402
from stedm_tpu.train.steps import SamplerConfig  # noqa: E402

# the clean-run auto:10 calibrated placement (/tmp/bench_c_auto_10_cfgi.log)
POSITIONS = (0, 1, 3, 8, 18, 25, 31, 36, 40, 44)
BATCH = bench.BATCH


def main() -> None:
    model, params, batch, schedule = bench.build_flagship(BATCH)
    base = dict(ddim_steps=bench.STEPS, eta=0.0, cfg_scale=1.5, rescale_phi=0.7,
                batched_cfg=True, downsample=4)
    configs = {
        "sched": dict(cache_interval=1, cache_levels=1, cache_schedule=POSITIONS),
        "sched_cfgi": dict(cache_interval=1, cache_levels=1,
                           cache_schedule=POSITIONS, cfg_interval=(0.2, 0.8)),
        "i3_cfgi": dict(cache_interval=3, cache_levels=1,
                        cfg_interval=(0.2, 0.8)),
    }
    mean = jax.jit(lambda x: x.mean())
    rng = jax.random.PRNGKey(0)

    for name, serving in configs.items():
        fn = make_host_sample_fn(model, schedule, SamplerConfig(**serving, **base),
                                 unroll=bench.UNROLL)
        img = bench.warm(fn, params, batch, rng)
        float(mean(img))
        # whole-trajectory throughput, async-pipelined (bench.py's protocol)
        t0 = time.perf_counter()
        means = [mean(fn(params, batch, jax.random.fold_in(rng, i)))
                 for i in range(4)]
        float(jnp.stack(means).sum())
        ips = BATCH * 4 / (time.perf_counter() - t0)
        print(f"[{name}] whole-trajectory: {ips:.2f} img/s", file=sys.stderr)
        # per-block device times (sync per block — relative values only)
        os.environ["STEDM_HOST_BLOCK_TIMING"] = "1"
        for rep in range(3):
            print(f"[{name}] rep {rep}:", file=sys.stderr)
            float(mean(fn(params, batch, jax.random.fold_in(rng, 100 + rep))))
        os.environ["STEDM_HOST_BLOCK_TIMING"] = "0"


if __name__ == "__main__":
    main()
