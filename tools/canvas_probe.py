#!/usr/bin/env python
"""Drive a tiled-canvas synthesis on the attached TPU once (VERDICT r2 task 7).

`predict_diff.py +canvas_size=` runs the scanned sampler with every eps
evaluation tiled over overlapping latents (`train/steps._sample_tiled`, the
reference's fold/unfold role, reference ddpm.py:905-987). That path is seam
-tested on the CPU mesh but had never synthesized a canvas through the axon
tunnel terminal. This probe builds the flagship model ON the TPU (params as jit
arguments — CLAUDE.md tunnel rules), compiles the tiled DDIM-50 CFG program for
a canvas_size x canvas_size layout, runs it, and reports canvas/sec + px/sec.

    python tools/canvas_probe.py [--canvas 512] [--batch 1] [--steps 50]

Results are recorded in BASELINE.md (round-3 table).
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--canvas", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--host", action="store_true",
                    help="drive the host-block sampler (tiled eps inside "
                         "blocks) instead of the one-program scan")
    args = ap.parse_args()

    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.models.stedm import STEDM
    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    patch = 256
    model = STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=128,
                         num_res_blocks=2, channel_mult=(1, 4, 8), num_heads=8,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=8192, ddconfig=dict(
            double_z=False, z_channels=3, resolution=patch, in_channels=3,
            out_ch=3, ch=128, ch_mult=[1, 2, 4], num_res_blocks=2,
            attn_resolutions=[], dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean", style_sampling="nearby", patch_size=patch,
        dtype=jnp.bfloat16,
    )

    b, canvas = args.batch, args.canvas
    rng = jax.random.PRNGKey(0)
    # style patches stay at training-patch size; the layout is the big canvas
    batch = {
        "segmentation": jnp.zeros((b, canvas, canvas, 2),
                                  jnp.float32).at[..., 0].set(1.0),
        "style_imgs": jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (b, 1, patch, patch, 3)),
            jnp.float32),
    }
    init_img = jnp.zeros((b, patch, patch, 3), jnp.float32)
    t0 = time.perf_counter()
    params = model.init(rng, init_img, batch["segmentation"][:, :patch, :patch],
                        batch["style_imgs"], jnp.zeros((b,), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.005 if p.ndim == 4 else p, params)
    print(f"init on device: {time.perf_counter() - t0:.0f}s", file=sys.stderr,
          flush=True)

    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    cfg = SamplerConfig(ddim_steps=args.steps, eta=0.0, cfg_scale=1.5,
                        rescale_phi=0.7, batched_cfg=True, downsample=4)
    if args.host:
        from stedm_tpu.train.host_sampler import make_host_sample_fn

        sample = make_host_sample_fn(model, schedule, cfg)
    else:
        sample = jax.jit(make_sample_fn(model, schedule, cfg))
    mean = jax.jit(lambda x: x.mean())

    t0 = time.perf_counter()
    img = sample(params, batch, rng)
    m0 = float(mean(img))  # dependent readback = true completion (CLAUDE.md)
    print(f"compile+first run: {time.perf_counter() - t0:.0f}s, "
          f"out {img.shape}, mean {m0:.4f}", file=sys.stderr, flush=True)
    assert img.shape == (b, canvas, canvas, 3)
    assert np.isfinite(m0)

    t0 = time.perf_counter()
    means = [mean(sample(params, batch, jax.random.fold_in(rng, i)))
             for i in range(args.iters)]
    float(jnp.stack(means).sum())
    dt = time.perf_counter() - t0
    per_canvas = dt / (args.iters * b)
    print(f"canvas {canvas}x{canvas} DDIM-{args.steps} CFG: "
          f"{per_canvas:.2f} s/canvas ({b * args.iters / dt:.3f} canvas/s, "
          f"{canvas * canvas * b * args.iters / dt / 1e6:.2f} Mpx/s)",
          flush=True)


if __name__ == "__main__":
    main()
