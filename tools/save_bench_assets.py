"""Produce bench.py's committed critical-path assets (VERDICT r4 task 1).

Round 4's driver bench run timed out (BENCH_r04.json rc=124, parsed=null)
because two slow stages sat on the critical path of every `python bench.py`:

  1. bench-time drift calibration for the `auto:R` default schedule
     (49 eps evaluations through the remote tunnel at startup), and
  2. two fresh `jit(...).lower().compile()` cost-analysis calls AFTER the
     timing rounds, i.e. between the last measurement and the JSON print.

This tool runs both ONCE on the real chip and commits the results:

  tools/bench_assets/drift_untrained_flagship.npy
      full-precision drift profile of the in-process untrained flagship
      (deterministic: PRNGKey(0) init + PRNGKey(42) trajectory, batch 8),
      loaded by bench.py as the default `auto:R` profile so calibration
      leaves the critical path (STEDM_BENCH_CALIBRATE=1 restores the old
      bench-time calibration; STEDM_BENCH_DRIFT_NPY still overrides).
  tools/bench_assets/flops_cache.json
      XLA cost-analysis FLOPs for the per-step eps call and the VQ decode,
      keyed by (batch, patch) of the fixed flagship config, so the analytic
      A100 baseline needs no compiles at bench time (STEDM_BENCH_RECOST=1
      recomputes and refreshes the sidecar).

Run under the bench flock (not timing-sensitive itself, but it must not
perturb a concurrent timing job on this 1-core host):

    flock /tmp/stedm_bench.lock python tools/save_bench_assets.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def main() -> None:
    assets = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_assets")
    os.makedirs(assets, exist_ok=True)

    batch_n = bench.BATCH
    model, params, batch, schedule = bench.build_flagship(batch_n)

    # ---- drift profile (identical inputs to bench.py's calibrate()) --------
    from stedm_tpu.core.cache_schedule import positions_from_spec
    from stedm_tpu.core.ddim import DDIMParams
    from stedm_tpu.train.calibrate import measure_cache_drift
    from stedm_tpu.train.steps import SamplerConfig

    base = dict(ddim_steps=bench.STEPS, eta=0.0, cfg_scale=1.5,
                rescale_phi=0.7, batched_cfg=True, downsample=4)
    drift = measure_cache_drift(model, schedule, SamplerConfig(**base),
                                params, batch, jax.random.PRNGKey(42))
    drift_path = os.path.join(assets, "drift_untrained_flagship.npy")
    np.save(drift_path, drift)
    n_steps = DDIMParams.create(schedule, bench.STEPS, 0.0).num_steps
    pos = positions_from_spec("auto:5", n_steps, drift)
    print(f"drift profile -> {drift_path} ({len(drift)} entries)",
          file=sys.stderr)
    print("auto:5 placement from saved profile: " + str(list(pos)),
          file=sys.stderr)

    # ---- cost-analysis FLOPs (same programs bench.py used to cost) ---------
    def _flops(fn, *args) -> float:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    var = {"params": params}
    seg_cond = jax.jit(lambda v, s: model.apply(v, s, method=model.cond_encode))(
        var, batch["segmentation"])
    style = jax.jit(lambda v, s: model.apply(v, s, method=model.style_encode))(
        var, batch["style_imgs"])
    z = jnp.zeros((batch_n, bench.PATCH // 4, bench.PATCH // 4, 3), jnp.float32)
    t = jnp.zeros((2 * batch_n,), jnp.int32)
    eps_flops = _flops(
        lambda v, x, t_, sc, st: model.apply(
            v, jnp.concatenate([x, x]), t_, jnp.concatenate([sc, sc]),
            jnp.concatenate([st, st]), method=model.eps),
        var, z, t, seg_cond, style)
    dec_flops = _flops(
        lambda v, x: model.apply(v, x, method=model.decode_first_stage), var, z)

    key = f"flagship_b{batch_n}_p{bench.PATCH}"
    path = os.path.join(assets, "flops_cache.json")
    cache = {}
    if os.path.exists(path):
        with open(path) as f:
            cache = json.load(f)
    cache[key] = {"eps_flops": eps_flops, "dec_flops": dec_flops,
                  "backend": jax.default_backend()}
    with open(path, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    per_img = (bench.STEPS * eps_flops + dec_flops) / batch_n
    print(f"flops cache -> {path}: {key} eps={eps_flops:.4g} "
          f"dec={dec_flops:.4g} per-image={per_img / 1e12:.3f} TF",
          file=sys.stderr)


if __name__ == "__main__":
    main()
