"""Per-block timing of the sparse composed frontier points (auto:3..auto:6).

The 2026-08-19 frontier sweep measured composed serving throughput that is
NON-MONOTONIC in refresh count (auto:5 37.3 > auto:4 34.3 > auto:6 26.1 img/s,
auto:3 anomalously 4.3), while the FLOP count decreases monotonically. The
suspected mechanism is the host-block partition (`core/cache_schedule.py:
coalesce_blocks`): a refresh period longer than the unroll budget becomes one
OVERSIZED block program (auto:3's placement [0, 4, 36] yields a 32-step block;
auto:4 a 25-step one; auto:6 a 17-step one), and large unrolled programs may
run disproportionately slowly on the remote terminal.

This probe builds the exact flagship host-block samplers bench.py builds, with
the frontier placements passed EXPLICITLY (the calibrated positions from the
sweep logs — no re-calibration noise), reproduces each whole-trajectory
throughput, and re-runs with STEDM_HOST_BLOCK_TIMING=1 so the host sampler
prints per-block device times — localizing whether the oversized block is the
pathology (motivating cache-carry across block boundaries) or the time is
spread evenly (per-dispatch overhead).

Run serialized (1-core host):
  flock /tmp/stedm_bench.lock python tools/frontier_block_probe.py [auto_3 ...]
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

# calibrated placements from the 2026-08-19 sweep logs (bench_f_auto_*.log)
PLACEMENTS = {
    "auto_3": (0, 4, 36),
    "auto_4": (0, 4, 29, 40),
    "auto_5": (0, 3, 21, 33, 41),
    "auto_6": (0, 2, 8, 25, 34, 41),
}
BATCH = bench.BATCH


def main() -> None:
    # each arg is `auto_N` (non-carry coalesced partition) or `auto_N_carry`
    # (cross-block cache carry: uniform unroll-sized blocks, the cache threads
    # between programs as a donated argument — host_sampler.py carry_cache)
    names = sys.argv[1:] or list(PLACEMENTS)
    model, params, batch, schedule = bench.build_flagship(BATCH)
    base = dict(ddim_steps=bench.STEPS, eta=0.0, cfg_scale=1.5, rescale_phi=0.7,
                batched_cfg=True, downsample=4)
    mean = jax.jit(lambda x: x.mean())
    rng = jax.random.PRNGKey(0)

    for name in names:
        carry = name.endswith("_carry")
        placement = PLACEMENTS[name.removesuffix("_carry")]
        serving = dict(cache_interval=1, cache_levels=1,
                       cache_schedule=placement,
                       cfg_interval=(0.2, 0.8))
        fn = make_host_sample_fn(model, schedule, SamplerConfig(**serving, **base),
                                 unroll=bench.UNROLL, carry_cache=carry)
        img = bench.warm(fn, params, batch, rng)
        float(mean(img))
        # whole-trajectory throughput, async-pipelined (bench.py's protocol),
        # best-of-3 rounds: the tunnel's host jitter is one-sided and large
        # (the same auto:6 program measured 26.1 and 35.7 img/s in two
        # serialized runs), so single rounds are untrustworthy
        rates = []
        for r in range(3):
            t0 = time.perf_counter()
            means = [mean(fn(params, batch, jax.random.fold_in(rng, 1000 * r + i)))
                     for i in range(4)]
            float(jnp.stack(means).sum())
            rates.append(BATCH * 4 / (time.perf_counter() - t0))
        print(f"[{name}] whole-trajectory: best {max(rates):.2f} img/s, rounds "
              + " ".join(f"{v:.2f}" for v in rates), file=sys.stderr)
        # per-block device times (sync per block — relative values only)
        os.environ["STEDM_HOST_BLOCK_TIMING"] = "1"
        for rep in range(3):
            print(f"[{name}] rep {rep}:", file=sys.stderr)
            float(mean(fn(params, batch, jax.random.fold_in(rng, 100 + rep))))
        os.environ["STEDM_HOST_BLOCK_TIMING"] = "0"


if __name__ == "__main__":
    main()
