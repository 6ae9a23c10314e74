"""Piecewise TPU profile of the flagship sampler (bench.py's configuration).

Times each compute piece of the serving pipeline in steady state and reports
achieved TFLOP/s so optimization effort goes where the time is:

* ``eps_exact``   — one shared-encoder CFG U-Net eval (the exact sampler's step)
* ``eps_full``    — same, plus the deep-feature cache output (serving mode refresh)
* ``eps_cached``  — shallow-levels-only eval reusing the cache (serving mode)
* ``decode``      — VQ-f4 decode 64^2 latent -> 256^2 image

``--no-fused`` forces the jnp GroupNorm fallback so the fused Pallas
GroupNorm(+add|FiLM)(+SiLU) kernel (`stedm_tpu/ops/gn_silu.py`) can be A/B'd
against XLA's two-pass lowering of the same math.

Timing honesty on the remote tunnel (CLAUDE.md): each piece runs as K chained
iterations inside ONE jitted lax.scan whose carry depends on every iteration's
output, and the clock stops on a 4-byte host readback of the final carry's mean.

Params are built from ``jax.eval_shape`` on model.init + host-side fills — timing
does not depend on parameter values, and this skips the ~10-min flagship init.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 8
PATCH = 256
V5E_BF16_PEAK = 197e12  # TPU v5e dense bf16 peak FLOP/s


def build_model(dtype=jnp.bfloat16, use_checkpoint: bool = False,
                swin_remat_attn: bool = True, attn_impl: str = "exact"):
    from stedm_tpu.models.stedm import STEDM

    return STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=128,
                         num_res_blocks=2, channel_mult=(1, 4, 8), num_heads=8,
                         attention_resolutions=(32, 16, 8),
                         use_checkpoint=use_checkpoint, attn_impl=attn_impl),
        first_stage_config=dict(embed_dim=3, n_embed=8192, ddconfig=dict(
            double_z=False, z_channels=3, resolution=PATCH, in_channels=3, out_ch=3,
            ch=128, ch_mult=[1, 2, 4], num_res_blocks=2, attn_resolutions=[],
            dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean",
        style_sampling="nearby",
        patch_size=PATCH,
        dtype=dtype,
        swin_remat_attn=swin_remat_attn,
    )


def shape_init_params(model) -> dict:
    """Parameter tree with bench-like values, without running the real init.

    Values are generated ON DEVICE by one jitted program — host-side fills would
    push ~1.3 GB through the tunnel at ~30 MB/s (three quarters of an hour)."""
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((BATCH, PATCH, PATCH, 3), jnp.float32)
    seg = jnp.zeros((BATCH, PATCH, PATCH, 2), jnp.float32)
    sty = jnp.zeros((BATCH, 1, PATCH, PATCH, 3), jnp.float32)
    t = jnp.zeros((BATCH,), jnp.int32)
    shapes = jax.eval_shape(model.init, rng, img, seg, sty, t)["params"]
    paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(shapes)[0]]

    @jax.jit
    def make(key):
        def fill(path, s, k):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("scale", "gamma"):
                return jnp.ones(s.shape, s.dtype)
            if name in ("bias", "beta", "b"):
                return jnp.zeros(s.shape, s.dtype)
            fan_in = int(np.prod(s.shape[:-1])) or 1
            return (jax.random.normal(k, s.shape, jnp.float32)
                    / np.sqrt(fan_in)).astype(s.dtype)

        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(key, len(leaves))
        return treedef.unflatten(
            [fill(p, s, k) for p, s, k in zip(paths, leaves, keys)])

    return make(rng)


VAR = None  # set by main(): the param tree passed to every timed step


def timed_scan(step_fn, carry0, n_iters: int, label: str) -> float:
    """Per-call seconds for step_fn, measured as a host-pipelined loop of one
    jitted step with a carried dependency and a final scalar host readback.

    (A scanned K-iteration program would be the tighter measurement, but this
    sandbox's tunnel cannot compile XLA loops around the U-Net — see
    stedm_tpu/train/host_sampler.py. Host pipelining measures within ~5-10% of
    the in-scan rate.)"""
    # params must be a jit ARGUMENT: a closed-over 1.3GB tree inlines into the
    # serialized module as constants and the tunnel drops the giant upload
    step = jax.jit(step_fn, donate_argnums=(1,))

    def run(carry):
        carry = carry + 0  # fresh buffer: the step donates its carry argument
        for i in range(n_iters):
            carry = step(VAR, carry, jnp.int32(i))
        return float(jnp.mean(
            jax.tree_util.tree_leaves(carry)[0].astype(jnp.float32)))

    t0 = time.perf_counter()
    for attempt in range(4):  # the tunnel drops very long compile requests
        try:
            run(carry0)  # compile + warmup
            break
        except jax.errors.JaxRuntimeError as e:
            if attempt == 3 or "remote_compile" not in str(e):
                raise
            print(f"  [{label}] remote compile dropped (attempt {attempt + 1}),"
                  " retrying", file=sys.stderr)
            time.sleep(20)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(carry0)
    dt = time.perf_counter() - t0
    print(f"  [{label}] compile+warm {compile_s:.1f}s, steady {dt:.3f}s "
          f"/ {n_iters} iters = {1e3 * dt / n_iters:.3f} ms/call", file=sys.stderr)
    return dt / n_iters


def flops_of(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def disable_fused_gn():
    """Force the jnp fallback in `stedm_tpu.ops.gn_silu` (A/B the Pallas
    kernel against XLA's two-pass lowering of the same math)."""
    from stedm_tpu.ops import gn_silu as mod

    mod._use_kernel = lambda *a, **k: False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--no-fused", action="store_true",
                    help="force the jnp GroupNorm fallback (A/B the kernel)")
    ap.add_argument("--pieces", default="eps_exact,eps_full,eps_cached,decode")
    args = ap.parse_args()

    if args.no_fused:
        disable_fused_gn()

    global VAR
    model = build_model()
    params = shape_init_params(model)
    var = {"params": params}
    VAR = var
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})",
          file=sys.stderr)

    b = BATCH
    lat = PATCH // 4
    z0 = jnp.asarray(np.random.default_rng(1).normal(size=(b, lat, lat, 3)),
                     jnp.float32)
    seg_cond = jnp.asarray(np.random.default_rng(2).normal(size=(b, lat, lat, 3)),
                           jnp.float32)
    ctx2 = jnp.asarray(np.random.default_rng(3).normal(size=(2 * b, 512)),
                       jnp.float32)
    t = jnp.full((2 * b,), 500, jnp.int32)

    results = {}
    pieces = args.pieces.split(",")

    if "eps_exact" in pieces:
        def eps_step(v, x, i):
            e = model.apply(v, x, t[:b] + i, seg_cond, ctx2, method=model.eps)
            return x + 1e-4 * (e[:b] + e[b:])
        sec = timed_scan(eps_step, z0, args.iters, "eps_exact")
        fl = flops_of(lambda v, x: model.apply(v, x, t[:b], seg_cond, ctx2,
                                               method=model.eps), var, z0)
        results["eps_exact"] = (sec, fl)

    if "eps_full" in pieces:
        def full_step(v, x, i):
            e, cache = model.apply(v, x, t[:b] + i, seg_cond, ctx2, 1,
                                   method=model.eps_full)
            return x + 1e-4 * (e[:b] + e[b:] + 1e-3 * jnp.mean(cache))
        sec = timed_scan(full_step, z0, args.iters, "eps_full")
        fl = flops_of(lambda v, x: model.apply(v, x, t[:b], seg_cond, ctx2, 1,
                                               method=model.eps_full)[0], var, z0)
        results["eps_full"] = (sec, fl)

    if "eps_cached" in pieces:
        _, cache = jax.jit(lambda v, x: model.apply(
            v, x, t[:b], seg_cond, ctx2, 1, method=model.eps_full))(var, z0)

        def cached_step(v, x, i):
            e = model.apply(v, x, t[:b] + i, seg_cond, cache, 1,
                            method=model.eps_cached)
            return x + 1e-4 * (e[:b] + e[b:])
        sec = timed_scan(cached_step, z0, args.iters, "eps_cached")
        fl = flops_of(lambda v, x: model.apply(v, x, t[:b], seg_cond, cache, 1,
                                               method=model.eps_cached), var, z0)
        results["eps_cached"] = (sec, fl)

    if "decode" in pieces:
        def dec_step(v, z, i):
            img = model.apply(v, z, method=model.decode_first_stage)
            return z + 1e-4 * img[:, ::4, ::4, :]
        sec = timed_scan(dec_step, z0, max(args.iters // 2, 10), "decode")
        fl = flops_of(lambda v, z: model.apply(v, z, method=model.decode_first_stage),
                      var, z0)
        results["decode"] = (sec, fl)

    report = {}
    for name, (sec, fl) in results.items():
        report[name] = {"ms": round(1e3 * sec, 3), "gflops": round(fl / 1e9, 1),
                        "tflops_per_s": round(fl / sec / 1e12, 2),
                        "mfu_vs_v5e_bf16": round(fl / sec / V5E_BF16_PEAK, 3)}
    print(json.dumps({"no_fused": args.no_fused, "pieces": report}, indent=1))


if __name__ == "__main__":
    main()
