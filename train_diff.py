#!/usr/bin/env python
"""Train the style- and layout-conditioned latent diffusion model.

TPU rebuild of the reference entry point (reference `train_diff.py:34-81`):
* per-device batch = batch_base * batch_mul; lr = base_lr * batch * n_devices
  (reference :36-39),
* data parallelism over a `jax.sharding.Mesh` (the DDPStrategy equivalent,
  reference :75) — batch sharded on the ``data`` axis, params replicated, gradient
  all-reduce inserted by XLA,
* gradient accumulation x4 (reference :76) inside the optimizer,
* keep-last checkpointing per epoch (monitor "epoch"/max, reference :64-66),
* epoch-end preview sampling from the fixed test folder when present
  (reference modules/ldm_diffusion.py:128-221).

Usage (same override surface as the reference README):
    python train_diff.py data=flowers style_sampling=augmented style_agg=mean \
        location.data_dir=/data location.result_dir=/results
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.config import compose
from stedm_tpu.core.schedules import DiffusionSchedule
from stedm_tpu.data.dm import DataModule
from stedm_tpu.models.stedm import build_stedm
from stedm_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    maybe_initialize_distributed,
    replicated,
)
from stedm_tpu.train import checkpoints
from stedm_tpu.train.optim import make_optimizer, scaled_lr
from stedm_tpu.train.steps import create_train_state, make_train_step
from stedm_tpu.train.steps import SamplerConfig
from stedm_tpu.utils.logging import EventLogger


def batch_to_ldm(np_batch: tuple) -> dict:
    """Collapse the C-class one-hot to 2 channels (BG vs any-FG) and build the LDM
    batch dict (reference modules/ldm_diffusion.py:51-60)."""
    img, one_hot, _seg, style = np_batch[:4]
    fg = one_hot[..., 1:].sum(axis=-1, keepdims=True)
    seg2 = np.concatenate([one_hot[..., :1], fg], axis=-1)
    return {"image": img, "segmentation": seg2.astype(np.float32),
            "style_imgs": style}


def main(argv: list[str]) -> None:
    cfg = compose("config_diff", argv)
    import stedm_tpu

    stedm_tpu.enable_compile_cache()
    maybe_initialize_distributed()

    # derived values (reference train_diff.py:36-39)
    if cfg.data.batch_size is None:
        cfg.data.batch_size = cfg.data.batch_base * cfg.location.batch_mul
    mesh = build_mesh(dict(cfg.location.mesh))
    n_devices = mesh.devices.size
    lr = scaled_lr(cfg.base_lr, cfg.data.batch_base, cfg.location.batch_mul,
                   n_devices, cfg.lr)
    global_batch = cfg.data.batch_size * n_devices

    run_name = f"{cfg.name}_{cfg.data.name}_{cfg.style_sampling.name}_{cfg.style_agg.name}"
    result_dir = f"{cfg.location.result_dir}/{run_name}"
    logger = EventLogger(result_dir, run_name, use_wandb=cfg.location.get("wandb", False),
                         config=dict(cfg))
    print(f"devices={n_devices} global_batch={global_batch} lr={lr:.3e}")

    # data
    dm = DataModule(cfg)
    if jax.process_index() == 0:
        dm.prepare_data()
    dm.setup()

    # model + state
    model = build_stedm(cfg)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    p = cfg.data.patch_size
    init_batch = {"image": jnp.zeros((1, p, p, 3)),
                  "segmentation": jnp.zeros((1, p, p, 2)),
                  "style_imgs": jnp.zeros((1, model.num_style_patches, p, p, 3))}
    params = model.init(rng, init_batch["image"], init_batch["segmentation"],
                        init_batch["style_imgs"], jnp.zeros((1,), jnp.int32))["params"]
    from stedm_tpu.utils.report import count_params

    count_params(params, name="STEDM")  # reference prints this at init (ddpm.py:90)

    # optional warm starts (reference ldm_based.yaml ckpt_path / vq-f4 ckpt_path)
    fs_ckpt = cfg.diffusion.first_stage_config.params.get("ckpt_path")
    if fs_ckpt:
        from stedm_tpu.utils.torch_import import load_into_params

        params = load_into_params(params, f"{cfg.location.result_dir}/{fs_ckpt}",
                                  subtree="first_stage")
    unet_ckpt = cfg.diffusion.get("ckpt_path")
    if unet_ckpt:
        from stedm_tpu.utils.torch_import import load_into_params

        params = load_into_params(
            params, f"{cfg.location.result_dir}/{unet_ckpt}",
            subtree="unet" if cfg.diffusion.get("load_only_unet", True) else None,
            ignore_keys=list(cfg.diffusion.get("ignore_keys", [])))

    schedule = DiffusionSchedule.create(
        cfg.diffusion.beta_schedule, cfg.diffusion.timesteps,
        cfg.diffusion.linear_start, cfg.diffusion.linear_end)

    # multi-host data contract: each process loads only its rank-interleaved
    # share of the global batch (DistributedSampler semantics); host_to_global
    # assembles the sharded global arrays inside the prefetcher
    from stedm_tpu.parallel.mesh import local_batch_size

    loader = dm.train_loader(seed=cfg.get("seed", 0))
    loader.batch_size = local_batch_size(global_batch)
    loader.process_shard = (jax.process_index(), jax.process_count())

    # first-batch latent std rescale (reference ddpm.py:480-494); the factor is
    # persisted so resumes reproduce restarted_from_ckpt semantics (set once, kept)
    if cfg.diffusion.get("scale_by_std", False):
        import json
        import os

        from stedm_tpu.train.steps import compute_scale_by_std

        sf_file = f"{result_dir}/scale_factor.json"
        if os.path.isfile(sf_file):
            with open(sf_file) as f:
                sf = json.load(f)["scale_factor"]
        else:
            first = batch_to_ldm(next(iter(loader)))
            loader.epoch = 0  # the peek must not consume an epoch's permutation
            sf = compute_scale_by_std(model, params, jnp.asarray(first["image"]))
            if jax.process_index() == 0:
                with open(sf_file, "w") as f:
                    json.dump({"scale_factor": sf}, f)
        print(f"### USING STD-RESCALING ### scale_factor={sf:.6f}")
        model = model.clone(scale_factor=sf)

    learn_logvar = cfg.diffusion.get("learn_logvar", False)
    logvar_init = cfg.diffusion.get("logvar_init", 0.0)
    if learn_logvar:
        # trainable per-timestep logvar rides the param tree (ddpm.py:113-117,
        # optimizer inclusion per ldm_diffusion.py:228-229)
        from stedm_tpu.train.steps import init_logvar

        params = init_logvar(params, cfg.diffusion.timesteps, logvar_init)

    # `+fused_adamw=true` opts into the flat-buffer fused AdamW — a measured
    # NEGATIVE on the v5e terminal (BASELINE.md round-5: relayout cost per
    # apply); kept as an experiment flag. Its opt_state layout differs, so
    # checkpoints are not interchangeable across the flag.
    # `+adamw_m_bf16=true`: bf16 first-moment storage (optax mu_dtype) — the
    # best measured training config on v5e (BASELINE.md round-5: 21.47
    # samples/s, 49.1% MFU, +6.4% over fp32 moments). Off by default: the
    # reference's torch AdamW keeps fp32 moments, so the parity default does
    # too. Second moment always stays fp32 (see train/fused_adamw.py).
    tx = make_optimizer(
        lr, style_encoder_trainable=cfg.diffusion.get("style_encoder_trainable", True),
        accumulate_grad_batches=cfg.get("accumulate_grad_batches", 4),
        clip_grad_norm=cfg.get("clip_grad_norm"),
        fused=bool(cfg.get("fused_adamw", False)),
        m_dtype=jnp.bfloat16 if cfg.get("adamw_m_bf16") else None)
    state = create_train_state(params, tx)

    # preemption-safe resume (SURVEY.md §5.3: deterministic sampling + frequent
    # checkpoints replace elastic recovery): resume=true reloads the last epoch
    start_epoch = 0
    if cfg.get("resume"):
        try:
            state = checkpoints.restore(result_dir + "/ckpt", jax.device_get(state),
                                        name=f"{run_name}_last")
            start_epoch = int(state.step) // max(len(dm.train_loader()), 1)
            print(f"resumed from step {int(state.step)} (epoch ~{start_epoch})")
        except Exception as exc:
            print(f"resume requested but no checkpoint loaded ({exc}); fresh start")

    rep = replicated(mesh)
    dp = batch_sharding(mesh)
    state = jax.device_put(state, rep)
    train_step = jax.jit(make_train_step(model, schedule, tx,
                                         loss_type=cfg.diffusion.get("loss_type", "l1"),
                                         learn_logvar=learn_logvar,
                                         logvar_init=logvar_init),
                         in_shardings=(rep, dp, rep), out_shardings=rep, donate_argnums=0)

    step_rng = jax.random.PRNGKey(cfg.get("seed", 0) + 1)

    from stedm_tpu.data.prefetch import prefetch_to_device

    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        losses = []
        batches = prefetch_to_device(loader, size=cfg.location.get("prefetch", 2),
                                     transform=batch_to_ldm, sharding=dp)
        for batch in batches:
            state, metrics = train_step(state, batch, step_rng)
            losses.append(metrics["loss"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        logger.log({"Train Loss": train_loss, "epoch": epoch,
                    "epoch_time_s": time.time() - t0}, step=int(state.step))

        if jax.process_index() == 0:
            checkpoints.save(result_dir + "/ckpt",
                             jax.device_get(state), name=f"{run_name}_last")

        preview_previews(cfg, model, schedule, state, logger, epoch)

    logger.close()


def _load_preview_styles(cfg, folder: str) -> list[np.ndarray]:
    """The reference's 4 fixed test styles (ldm_diffusion.py:145-172): 'nearby'
    loads {i}_img.png, 'mp' concatenates {i}_img_{j}.png over the set axis,
    'dummy' uses a constant -1 set."""
    import os

    from PIL import Image

    load = lambda f: (np.array(Image.open(f))[:, :, :3].astype(np.float32)
                      / 127.5 - 1)
    style_dir = f"{folder}/{cfg.style_sampling.name}"
    styles = []
    if cfg.style_sampling.name == "dummy":
        p = cfg.data.patch_size
        return [np.full((1, 1, p, p, 3), -1.0, np.float32)] * 4
    for i in range(4):
        if cfg.style_sampling.name == "mp":
            parts = []
            for j in range(cfg.style_sampling.get("num_patches", 1)):
                f = f"{style_dir}/{i}_img_{j}.png"
                if os.path.isfile(f):
                    parts.append(load(f)[None, None])
            if parts:
                styles.append(np.concatenate(parts, axis=1))
        else:
            f = f"{style_dir}/{i}_img.png"
            if os.path.isfile(f):
                styles.append(load(f)[None, None])
    return styles


def preview_previews(cfg, model, schedule, state, logger, epoch) -> None:
    """Epoch-end fixed-style previews (reference ldm_diffusion.py:128-221), gated on
    the test folder existing on disk: 4 unguided samples at 128 DDIM steps, plus —
    when style drop is active — CFG variants at guidance scales 3 and 5 on the
    first two styles (ldm_diffusion.py:195-221)."""
    import os

    test_folder = cfg.data.get("test_folder")
    if not test_folder:
        return
    folder = f"{cfg.location.data_dir}/{test_folder}"
    if not os.path.isdir(folder):
        return
    from PIL import Image

    cond_path = f"{folder}/test_c.png"
    if not os.path.isfile(cond_path):
        return
    test_img = np.array(Image.open(cond_path).convert("L"))
    test_img = (test_img > 0).astype(np.int64)
    one_hot = np.eye(2, dtype=np.float32)[test_img][None]

    styles = _load_preview_styles(cfg, folder)
    if not styles:
        return

    from stedm_tpu.train.host_sampler import make_auto_sample_fn

    steps = cfg.get("preview_ddim_steps", 128)  # reference uses 128 (ldm_diffusion.py:185)
    sample = make_auto_sample_fn(model, schedule, SamplerConfig(
        ddim_steps=steps, eta=0.0, cfg_scale=1.0, use_cfg=False, downsample=4))
    imgs = []
    for style in styles:
        batch = {"segmentation": jnp.asarray(one_hot),
                 "style_imgs": jnp.asarray(style)}
        img = sample(state.params, batch, jax.random.PRNGKey(epoch))
        imgs.append(np.asarray(img[0]))
    logger.log_images("Sample Images", imgs, step=epoch)

    # CFG previews (ldm_diffusion.py:195-221): styles 0/1 at guidance 3 and 5,
    # uncond = dropped (constant -2) style, built inside make_sample_fn
    if cfg.get("style_drop_rate", 0.0) > 0.0 and cfg.style_sampling.name != "dummy":
        cfg_imgs = []
        for style in styles[:2]:
            batch = {"segmentation": jnp.asarray(one_hot),
                     "style_imgs": jnp.asarray(style)}
            for scale in (3.0, 5.0):
                cfg_sample = make_auto_sample_fn(model, schedule, SamplerConfig(
                    ddim_steps=steps, eta=0.0, cfg_scale=scale, rescale_phi=0.7,
                    batched_cfg=True, downsample=4))
                img = cfg_sample(state.params, batch, jax.random.PRNGKey(epoch))
                cfg_imgs.append(np.asarray(img[0]))
        logger.log_images("Sample Images CFG", cfg_imgs, step=epoch)


if __name__ == "__main__":
    main(sys.argv[1:])
