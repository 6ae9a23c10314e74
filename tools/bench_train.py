"""Flagship training-step throughput on the attached TPU chip.

Times the full 512^2 STEDM training step (encode + cond + style + U-Net
fwd/bwd + AdamW + EMA, bf16 compute) in steady state with the dependent
-readback method (CLAUDE.md timing honesty). Params come from eval_shape +
on-device fills — value-independent timing without the ~10-min real init.

Also serves as the canary for whether the tunnel's AOT compile service accepts
the train-step program (it contains no XLA loops; optax MultiSteps adds a
`lax.cond`, probed separately via --accum).
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=512)
    ap.add_argument("--accum", type=int, default=4,
                    help="grad accumulation (reference train_diff.py:76); "
                         "1 bypasses optax MultiSteps' lax.cond")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize U-Net ResBlocks under grad "
                         "(unet.use_checkpoint) — trades FLOPs for HBM")
    ap.add_argument("--optax_adamw", action="store_true",
                    help="A/B: stock per-leaf optax.adamw instead of the "
                         "flat-buffer fused AdamW (train/fused_adamw.py)")
    ap.add_argument("--m_bf16", action="store_true",
                    help="store the AdamW first moment in bf16 (optax "
                         "mu_dtype on the default path; fused m_dtype with "
                         "--no --optax_adamw)")
    ap.add_argument("--attn", default="exact",
                    choices=["exact", "chunked", "flash", "auto"],
                    help="bottleneck AttentionBlock SDPA realization "
                         "(ops/blocked_attention.py) — flash = stock Pallas "
                         "TPU kernel, chunked = checkpointed query-chunk scan")
    ap.add_argument("--no_swin_remat", action="store_true",
                    help="A/B: store the swin window-attention fp32 "
                         "logits/softmax residuals instead of rematerializing "
                         "them (the pre-round-5 behavior)")
    ap.add_argument("--no_cost", action="store_true",
                    help="skip the XLA cost analysis (saves one AOT lowering)")
    ap.add_argument("--loader", choices=["flowers", "her2"],
                    help="feed the step through the REAL DataModule Loader "
                         "(tools/bench_loader.py trees) instead of one fixed "
                         "device-resident batch — measures the end-to-end "
                         "input-bound rate incl. host decode/augment and H2D "
                         "(through the axon tunnel H2D alone is ~30 MB/s)")
    ap.add_argument("--workers", type=int, default=4,
                    help="Loader worker threads for --loader mode")
    args = ap.parse_args()

    import tools.profile_sampler as ps

    ps.PATCH = args.patch
    ps.BATCH = args.batch
    model = ps.build_model(use_checkpoint=args.remat,
                           swin_remat_attn=not args.no_swin_remat,
                           attn_impl=args.attn)
    params = ps.shape_init_params(model)
    print(f"backend: {jax.devices()[0]}; params ready", file=sys.stderr)

    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.train.optim import make_optimizer
    from stedm_tpu.train.steps import create_train_state, make_train_step

    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    tx = make_optimizer(1e-4, accumulate_grad_batches=args.accum,
                        fused=not args.optax_adamw,
                        m_dtype=jnp.bfloat16 if args.m_bf16 else None)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, schedule, tx), donate_argnums=(0,))

    b, p = args.batch, args.patch
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, p, p, 3)), jnp.float32),
        "segmentation": jnp.zeros((b, p, p, 2), jnp.float32).at[..., 0].set(1.0),
        "style_imgs": jnp.asarray(rng.uniform(-1, 1, (b, 1, p, p, 3)),
                                  jnp.float32),
    }

    # XLA cost analysis of the SAME jitted program that gets timed (VERDICT r3
    # task 2: training deserves the FLOP/MFU accounting the sampler has).
    # Under optax MultiSteps the module contains a lax.cond whose two branches
    # (accumulate vs apply) the analysis may both count once — with accum=1
    # there is no cond and the number is exact; report both alongside.
    flops_per_step = None
    if not args.no_cost:
        try:
            cost = (jax.jit(make_train_step(model, schedule, tx))
                    .lower(state, batch, jax.random.PRNGKey(0))
                    .compile().cost_analysis())
            if isinstance(cost, list):
                cost = cost[0]
            flops_per_step = float(cost.get("flops", 0.0))
            print(f"XLA cost analysis: {flops_per_step / 1e12:.2f} TF/step "
                  f"({flops_per_step / (b * 1e12):.2f} TF/sample)",
                  file=sys.stderr)
        except Exception as e:  # keep the timing usable if AOT costing fails
            print(f"cost analysis unavailable: {e!r}", file=sys.stderr)

    # --loader: real host pipeline feeding the step (VERDICT r3 task 3's
    # "measured, not guessed" input-bound rate). The device-batch path below
    # stays the pure-compute number; the delta between the two IS the input
    # pipeline's cost on this host/tunnel.
    batch_iter = None
    if args.loader:
        import tempfile
        from pathlib import Path

        from tools.bench_loader import build_dm, make_flowers_tree, make_her2_tree

        tmpdir = tempfile.TemporaryDirectory()
        tree = (make_flowers_tree(Path(tmpdir.name), size=args.patch)
                if args.loader == "flowers"
                else make_her2_tree(Path(tmpdir.name),
                                    slide=max(2048, 4 * args.patch)))
        dm = build_dm(args.loader, tree, args.patch, args.batch, args.workers)

        def gen():
            while True:
                for tup in dm.train_loader(seed=0):
                    if len(tup[0]) == args.batch:
                        yield {k: jnp.asarray(v) for k, v in
                               _to_ldm(tup).items()}

        def _to_ldm(tup):
            img, one_hot, _seg, style = tup[:4]
            fg = one_hot[..., 1:].sum(axis=-1, keepdims=True)
            seg2 = np.concatenate([one_hot[..., :1], fg], axis=-1)
            return {"image": img, "segmentation": seg2.astype(np.float32),
                    "style_imgs": style}

        batch_iter = gen()
        batch = next(batch_iter)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    loss0 = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, "
          f"loss={loss0:.4f}", file=sys.stderr)
    assert np.isfinite(loss0)

    t0 = time.perf_counter()
    losses = []
    for i in range(args.iters):
        cur = next(batch_iter) if batch_iter is not None else batch
        state, metrics = step(state, cur, jax.random.fold_in(key, i))
        losses.append(metrics["loss"])
    total = float(jnp.stack(losses).sum())  # dependent readback stops the clock
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    V5E_BF16_PEAK = 197e12
    out = {
        "metric": f"{p}x{p} training throughput",
        "value": round(b * args.iters / dt, 3),
        "unit": "samples/sec/chip",
        "ms_per_step": round(1e3 * dt / args.iters, 1),
        "accum": args.accum,
        "remat": bool(args.remat),
        "optimizer": ("optax_adamw" if args.optax_adamw else
                      "fused_adamw" + ("_m_bf16" if args.m_bf16 else "")),
        "swin_remat": not args.no_swin_remat,
        "attn_impl": args.attn,
        "input": args.loader or "device-resident",
    }
    if flops_per_step:
        rate = flops_per_step * args.iters / dt
        out["tf_per_step"] = round(flops_per_step / 1e12, 2)
        out["achieved_tf_s"] = round(rate / 1e12, 1)
        out["mfu_vs_v5e_bf16_peak"] = round(rate / V5E_BF16_PEAK, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
