#!/usr/bin/env python
"""Generate synthetic (image, segmentation) pairs with DDIM + rescaled CFG.

TPU rebuild of the reference entry point (reference `predict_diff.py:34-92`):
* loads a trained checkpoint non-strictly (reference :46-48),
* writes ``img_NNNNN.png`` / ``seg_NNNNN.png`` pairs under
  ``data_dir/syn_data/<name>`` (reference :51-57, ldm_diffusion.py:94-107),
* doubles ``cfg.data.samples`` (reference :62),
* shards the generation grid across devices (the DDP predict-sampler equivalent,
  reference :84-89) by sharding the sample batch over the mesh's data axis.

The sampler is a jitted `lax.scan` with the cond/uncond CFG branches batched into a
single U-Net call (configs/config_predict.yaml `batched_cfg`).

The generation loop is pipelined one batch deep: batch k+1's H2D upload and
sampler programs are dispatched (async) before batch k's images are read back
and PNG-encoded, and the PNG quantization to uint8 runs on device so the
readback moves 4x fewer bytes — on slow-transfer terminals (axon tunnel,
~25-30 MB/s each way) the transfers would otherwise dominate the serving-mode
compute (measured: tools/predict_probe.py). `+compact_transfer=true`
additionally uploads the conditioning as uint8 seg indices + f16 style.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from stedm_tpu.config import compose
from stedm_tpu.core.schedules import DiffusionSchedule
from stedm_tpu.data.dm import DataModule
from stedm_tpu.models.stedm import build_stedm
from stedm_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)
from stedm_tpu.train import checkpoints
from stedm_tpu.train.steps import SamplerConfig, make_sample_fn
from train_diff import batch_to_ldm


def main(argv: list[str]) -> None:
    cfg = compose("config_predict", argv)
    import stedm_tpu

    stedm_tpu.enable_compile_cache()
    maybe_initialize_distributed()

    if cfg.data.batch_size is None:
        cfg.data.batch_size = cfg.data.batch_base * cfg.location.batch_mul
    mesh = build_mesh(dict(cfg.location.mesh))
    n_devices = mesh.devices.size
    global_batch = cfg.data.batch_size * n_devices

    # double the sample budget (reference predict_diff.py:62)
    cfg.data.samples = cfg.data.samples * 2

    ckpt_name = cfg.get("ckpt_name")
    run_name = ckpt_name or \
        f"diff_{cfg.data.name}_{cfg.style_sampling.name}_{cfg.style_agg.name}"
    predict_dir = Path(cfg.location.data_dir) / "syn_data" / cfg.get(
        "predict_name", cfg.data.name)
    predict_dir.mkdir(parents=True, exist_ok=True)

    dm = DataModule(cfg)
    if jax.process_index() == 0:
        dm.prepare_data()
    dm.setup()

    model = build_stedm(cfg)
    p = cfg.data.patch_size
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, p, p, 3)),
                        jnp.zeros((1, p, p, 2)),
                        jnp.zeros((1, model.num_style_patches, p, p, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
    ckpt_path = cfg.get("ckpt_path") or \
        f"{cfg.location.result_dir}/{run_name}/ckpt/{run_name}_last"
    state_like = {"params": params}
    try:
        restored = checkpoints.restore_params(ckpt_path + "/params", params)
        params = restored
    except Exception:
        # full-state checkpoint: rebuild the training optimizer structure
        # (grad-accum count included) so the orbax tree matches, then take params
        from stedm_tpu.train.optim import make_optimizer
        from stedm_tpu.train.steps import create_train_state

        tx = make_optimizer(
            1e-4,
            style_encoder_trainable=cfg.diffusion.get("style_encoder_trainable", True),
            accumulate_grad_batches=cfg.get("accumulate_grad_batches", 4))
        if cfg.diffusion.get("learn_logvar", False):
            # runs trained with learn_logvar carry the logvar group in the
            # checkpointed tree (sampling strips it later)
            from stedm_tpu.train.steps import init_logvar

            params = init_logvar(params, cfg.diffusion.timesteps,
                                 cfg.diffusion.get("logvar_init", 0.0))
        state = create_train_state(params, tx)
        state = checkpoints.restore(Path(ckpt_path).parent, state,
                                    name=Path(ckpt_path).name)
        params = state.params
        if cfg.get("use_ema"):
            # sample with the EMA shadow of the denoiser (the reference maintains
            # EMA but defaults to raw weights, SURVEY.md Q8)
            params = {**params, "unet": state.ema_params}
    del state_like

    schedule = DiffusionSchedule.create(
        cfg.diffusion.beta_schedule, cfg.diffusion.timesteps,
        cfg.diffusion.linear_start, cfg.diffusion.linear_end)
    use_cfg = (cfg.cfg_scale != 1) and (cfg.style_sampling.name != "none")
    sampler_cfg = SamplerConfig(
        ddim_steps=cfg.ddim_steps, eta=cfg.eta, cfg_scale=cfg.cfg_scale,
        rescale_phi=cfg.get("rescale_phi", 0.7),
        batched_cfg=cfg.get("batched_cfg", True), use_cfg=use_cfg, downsample=4,
        method=cfg.get("sampler", "ddim"),
        # serving mode: `+cache_interval=3` enables cross-step deep-feature reuse
        # (~2.3x sampling throughput, see BASELINE.md round-2 table); default 1 =
        # exact reference trajectory
        cache_interval=int(cfg.get("cache_interval", 1)),
        cache_levels=int(cfg.get("cache_levels", 1)))
    # guidance interval (arXiv 2404.07724): `+cfg_interval=[0.0,0.6]` applies
    # CFG only on that fraction of the trajectory (scan order); outside it only
    # the cond branch evaluates — a serving-mode FLOP lever priced like the
    # cache knobs (BASELINE.md). Default: guide every step (the reference
    # behavior, reference ddim.py:177-184). NOTE: a bare `lo:hi` is YAML
    # sexagesimal and parses as a single float — use the [lo,hi] list form.
    ci = cfg.get("cfg_interval", None)
    if ci is not None:
        import dataclasses as _dc0

        if isinstance(ci, str):
            lo_s, _, hi_s = ci.partition(":")
            ci = (float(lo_s), float(hi_s))
        elif isinstance(ci, (int, float)):
            raise SystemExit(
                f"+cfg_interval={ci!r}: pass the interval as a [lo,hi] list "
                "(a bare lo:hi parses as one YAML sexagesimal number)")
        else:
            ci = tuple(float(v) for v in ci)
        sampler_cfg = _dc0.replace(sampler_cfg, cfg_interval=ci)
    # non-uniform serving mode: `+cache_schedule=` takes explicit positions
    # ("0,3,7,..."), "uniform:N", "quad:R[:center[:power]]", or "auto:R" —
    # auto calibrates the refresh placement on the first predict batch (one
    # exact trajectory measuring per-step trunk drift; core/cache_schedule.py)
    cache_schedule_spec = cfg.get("cache_schedule", None)

    rep = replicated(mesh)
    dp = batch_sharding(mesh)
    params = jax.device_put(params, rep)

    # multi-host: rank-interleaved predict grid (the reference's DDP predict
    # sampler, predict_diff.py:84-89); each process loads/writes only its share
    from stedm_tpu.parallel.mesh import local_batch_size, local_rows

    n_local_devices = max(1, n_devices // jax.process_count())
    loader = dm.predict_loader()
    loader.batch_size = local_batch_size(global_batch)
    loader.process_shard = (jax.process_index(), jax.process_count())
    loader.drop_last = False
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    # canvases larger than the training patch (`+canvas_size=512` with patch 256):
    # adjacent layout patches are mosaicked into one canvas and synthesized in a
    # single trajectory via tiled eps/decode with weighted stitching (the
    # reference's fold/unfold role, ddpm.py:905-987; see train/steps._sample_tiled)
    canvas = int(cfg.get("canvas_size", 0) or 0)
    grid = 1
    if canvas > p:
        if canvas % p:
            raise SystemExit(f"canvas_size {canvas} must be a multiple of the "
                             f"training patch {p}")
        grid = canvas // p

    # under the axon tunnel, XLA-loop programs exceed the remote-compile limit:
    # single-device non-canvas DDIM switches to the host-driven sampler (same
    # per-step math; stedm_tpu/train/host_sampler.py). Override with
    # `+host_loop=true/false`.
    from stedm_tpu.train.host_sampler import host_loop_default, make_host_sample_fn

    loader_stream = iter(loader)
    if cache_schedule_spec is not None:
        import dataclasses as _dc
        import itertools

        from stedm_tpu.core.cache_schedule import positions_from_spec
        from stedm_tpu.core.ddim import DDIMParams

        if grid > 1:
            raise SystemExit("deep-feature caching (+cache_schedule=) is not "
                             "supported on tiled canvases (+canvas_size=)")
        n_steps = DDIMParams.create(schedule, cfg.ddim_steps, cfg.eta).num_steps
        spec = (str(cache_schedule_spec) if isinstance(cache_schedule_spec, str)
                else list(cache_schedule_spec))
        drift = None
        if isinstance(spec, str) and spec.startswith("auto"):
            from stedm_tpu.train.calibrate import measure_cache_drift

            first = next(loader_stream)
            loader_stream = itertools.chain([first], loader_stream)
            calib_cfg = _dc.replace(sampler_cfg, cache_interval=1,
                                    cache_schedule=None)
            drift = measure_cache_drift(model, schedule, calib_cfg, params,
                                        batch_to_ldm(first), rng)
        positions = positions_from_spec(spec, n_steps, drift)
        print(f"cache_schedule: refreshing the deep trunk at positions "
              f"{list(positions)} of {n_steps} steps")
        sampler_cfg = _dc.replace(sampler_cfg, cache_schedule=positions)

    use_host = cfg.get("host_loop", None)
    if use_host:
        # the host sampler is single-device/single-process; an explicit
        # +host_loop=true on a sharded mesh would silently run unsharded on one
        # device — fail fast instead (ADVICE r2). Canvases (grid > 1) ARE
        # host-drivable for exact DDIM (tiled eps/decode inside the blocks).
        if n_devices > 1 or jax.process_count() > 1:
            raise SystemExit(
                "+host_loop=true requires a single device and a single process "
                f"(got devices={n_devices}, processes={jax.process_count()}); "
                "drop host_loop to use the sharded scanned sampler")
    if use_host is None:
        use_host = (host_loop_default()
                    and sampler_cfg.method in ("ddim", "plms", "dpm")
                    and n_devices == 1 and jax.process_count() == 1
                    and (grid == 1 or (sampler_cfg.method == "ddim"
                                       and sampler_cfg.cache_interval == 1
                                       and sampler_cfg.cache_schedule is None)))
    if use_host:
        # +block_carry=true threads the serving-mode cache BETWEEN block
        # programs (uniform budget-sized chunks — no oversized program for a
        # sparse cache_schedule's long refresh periods); None defers to the
        # STEDM_BLOCK_CARRY env var. +unroll= overrides the steps-per-block
        # budget (default 10 in serving mode, auto in exact mode).
        sample = make_host_sample_fn(model, schedule, sampler_cfg,
                                     unroll=cfg.get("unroll", None),
                                     carry_cache=cfg.get("block_carry", None))
    else:
        sample = jax.jit(make_sample_fn(model, schedule, sampler_cfg),
                         in_shardings=(rep, dp, None), out_shardings=dp)

    # device-side uint8 conversion: the PNG quantization ((x+1)*127.5, trunc)
    # runs on device so the D2H readback is 4x smaller — on slow-transfer
    # terminals (the axon tunnel moves ~25-30 MB/s) the float32 image readback
    # alone costs ~0.2 s/batch, comparable to the serving-mode compute itself
    to_u8 = jax.jit(lambda x: ((x + 1.0) * 127.5).astype(jnp.uint8),
                    out_shardings=dp)
    # `+compact_transfer=true`: H2D the conditioning as uint8 class indices +
    # float16 style images (~3.5x fewer bytes). The seg one-hot round-trips
    # exactly (binary channels); the style cast is lossy at f16 resolution
    # (~5e-4 relative — far below the serving mode's own approximation), so
    # this stays opt-in and default-off to keep the exact path bit-exact.
    compact = bool(cfg.get("compact_transfer", False))
    expand = jax.jit(
        lambda seg_idx, style: {
            "segmentation": jax.nn.one_hot(seg_idx, 2, dtype=jnp.float32),
            "style_imgs": style.astype(jnp.float32)},
        out_shardings=dp)

    def flush(prev) -> None:
        """Read back + write one generated batch (the previous one — see loop)."""
        imgs_dev, segs, idxs, n_rows, bi = prev
        imgs = local_rows(imgs_dev)[:n_rows]  # this process's rows, uint8
        for img_u8, seg, num in zip(imgs, segs, idxs):
            num_str = str(int(num)).zfill(5)
            Image.fromarray(np.asarray(img_u8)).save(
                predict_dir / f"img_{num_str}.png")
            Image.fromarray(seg).save(predict_dir / f"seg_{num_str}.png")
        print(f"batch {bi}: wrote {n_rows} pairs to {predict_dir}", flush=True)

    # one-batch pipeline: dispatch batch k+1 (H2D + sampler programs are async)
    # BEFORE reading back batch k, so the D2H transfer and PNG encoding of k
    # overlap the device computing k+1 instead of serializing with it
    pending = None
    for batch_idx, np_batch in enumerate(loader_stream):
        ldm_batch = batch_to_ldm(np_batch)
        indices = np.asarray(np_batch[4])
        if grid > 1:
            g = grid * grid
            n = ldm_batch["segmentation"].shape[0] // g
            if n == 0:
                print(f"batch {batch_idx}: fewer than {g} layouts, skipping")
                continue

            def mosaic(x):  # [n*g, p, p, C] -> [n, grid*p, grid*p, C]
                x = x[:n * g].reshape(n, grid, grid, p, p, x.shape[-1])
                return x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    n, grid * p, grid * p, x.shape[-1])

            ldm_batch = {
                "image": ldm_batch["image"][:n * g:g],  # unused by sampling
                "segmentation": mosaic(ldm_batch["segmentation"]),
                "style_imgs": ldm_batch["style_imgs"][:n * g:g],  # one style/canvas
            }
            indices = indices[:n * g:g]
        b = ldm_batch["image"].shape[0]
        if b % n_local_devices:  # pad ragged final batch for even sharding
            pad = n_local_devices - b % n_local_devices
            # cycle rows so padding works even when pad > b (tiny final batches);
            # all processes see the same ragged size (wrap-padded index shards)
            ldm_batch = {k: np.resize(v, (b + pad,) + v.shape[1:])
                         for k, v in ldm_batch.items()}
        if compact:
            cb = shard_batch(mesh, {
                "seg": np.argmax(ldm_batch["segmentation"], -1).astype(np.uint8),
                "style": np.asarray(ldm_batch["style_imgs"], np.float16)})
            batch = expand(cb["seg"], cb["style"])
        else:
            batch = shard_batch(mesh, {k: np.asarray(v)
                                       for k, v in ldm_batch.items()
                                       if k != "image"})
        imgs_dev = to_u8(sample(params, batch, jax.random.fold_in(rng, batch_idx)))
        segs = np.argmax(ldm_batch["segmentation"][:b], axis=-1).astype(np.uint8)
        if pending is not None:
            flush(pending)
        pending = (imgs_dev, segs, indices, b, batch_idx)
    if pending is not None:
        flush(pending)


if __name__ == "__main__":
    main(sys.argv[1:])
