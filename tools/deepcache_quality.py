#!/usr/bin/env python
"""Quantify the serving-mode (cache_interval) deviation on a TRAINED model.

The bench's untrained-model PSNR is a worst case: random weights make the
trajectory chaotic. Here a tiny STEDM is actually trained on structured
synthetic data (fg/bg colored layouts) until the loss settles, then the exact
sampler (interval 1) is compared against cached intervals on held-out layouts.

    JAX_PLATFORMS=cpu python tools/deepcache_quality.py [--steps 400]

Prints one line per interval: PSNR / rel-RMS vs the exact trajectory.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--intervals", type=int, nargs="+", default=[2, 3, 5])
    ap.add_argument("--ddim_steps", type=int, default=50)
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")

    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.models.stedm import STEDM
    from stedm_tpu.train.optim import make_optimizer
    from stedm_tpu.train.steps import (SamplerConfig, create_train_state,
                                       make_sample_fn, make_train_step)

    patch = 32
    model = STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=32,
                         num_res_blocks=1, channel_mult=(1, 4, 8), num_heads=4,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=128, ddconfig=dict(
            double_z=False, z_channels=3, resolution=patch, in_channels=3,
            out_ch=3, ch=32, ch_mult=[1, 2, 4], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean", style_sampling="nearby", patch_size=patch,
    )

    def make_batch(rng: np.random.Generator, b: int = 8):
        # structured data: random fg blob, fg/bg base colors + texture noise
        seg = np.zeros((b, patch, patch, 2), np.float32)
        img = np.zeros((b, patch, patch, 3), np.float32)
        for i in range(b):
            y0, x0 = rng.integers(4, 16, 2)
            h, w = rng.integers(8, 16, 2)
            m = np.zeros((patch, patch), bool)
            m[y0:y0 + h, x0:x0 + w] = True
            seg[i, ..., 1] = m
            seg[i, ..., 0] = ~m
            fg, bg = rng.uniform(-0.8, 0.8, (2, 3))
            img[i] = np.where(m[..., None], fg, bg)
            img[i] += rng.normal(0, 0.08, (patch, patch, 3))
        style = np.repeat(img[:, None], 1, axis=1)
        return {"image": jnp.asarray(np.clip(img, -1, 1)),
                "segmentation": jnp.asarray(seg),
                "style_imgs": jnp.asarray(np.clip(style, -1, 1))}

    rng_np = np.random.default_rng(0)
    batch0 = make_batch(rng_np)
    params = model.init(jax.random.PRNGKey(0), batch0["image"],
                        batch0["segmentation"], batch0["style_imgs"],
                        jnp.zeros((8,), jnp.int32))["params"]
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    tx = make_optimizer(2e-4, accumulate_grad_batches=1)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, schedule, tx))
    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        state, metrics = step(state, make_batch(rng_np), key)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(metrics['loss']):.4f}", file=sys.stderr)

    test = make_batch(np.random.default_rng(123))
    skey = jax.random.PRNGKey(7)
    base_cfg = dict(ddim_steps=args.ddim_steps, eta=0.0, cfg_scale=1.5,
                    rescale_phi=0.7, batched_cfg=True, downsample=4)
    exact = np.asarray(jax.jit(make_sample_fn(
        model, schedule, SamplerConfig(**base_cfg)))(state.params, test, skey))
    for interval in args.intervals:
        cached = np.asarray(jax.jit(make_sample_fn(
            model, schedule, SamplerConfig(cache_interval=interval, **base_cfg)))(
            state.params, test, skey))
        mse = float(np.mean((cached - exact) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        rel = np.sqrt(mse) / (np.sqrt(float(np.mean(exact ** 2))) + 1e-12)
        print(f"interval={interval}: PSNR {psnr:.1f} dB, rel-RMS {rel:.4f} "
              f"(trained tiny model, DDIM-{args.ddim_steps} CFG)")


if __name__ == "__main__":
    main()
