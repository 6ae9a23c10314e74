#!/usr/bin/env python
"""Fine-tune the VQGAN first-stage codec (the reference's VQModel training).

The reference inherits this path from taming (reference
ldm/models/autoencoder.py:135-173: Lightning two-optimizer ``training_step``
through ``VQLPIPSWithDiscriminator``) but ships it dormant — every STEDM config
freezes the codec (``lossconfig: torch.nn.Identity``). This entry point makes
it live for domain adaptation: fine-tune vq-f4 on the target stain, then point
``diffusion.first_stage_config.params.ckpt_path`` at the result.

Usage (mirrors the other entry points' hydra-style overrides):
    python train_ae.py data=her2 location.data_dir=/data \
        diffusion/first_stage_config=vq-f4 +lpips_ckpt=/weights/vgg_lpips.pth

TPU notes: generator+discriminator updates run as ONE jitted program per batch
(single dispatch through the remote tunnel); params ride as arguments (never
closed over — CLAUDE.md); bf16 compute with fp32 params when
``diffusion.compute_dtype=bfloat16``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.config import compose
from stedm_tpu.data.dm import DataModule
from stedm_tpu.models.vq import VQModelInterface
from stedm_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)
from stedm_tpu.train import checkpoints
from stedm_tpu.train.ae_steps import (
    ae_optimizers,
    create_ae_state,
    make_ae_eval_step,
    make_ae_train_step,
)
from stedm_tpu.train.vae_losses import VAELossConfig, build_discriminator
from stedm_tpu.utils.logging import EventLogger


def build_codec(cfg, dtype):
    """Instantiate the codec named by ``first_stage_config.target`` —
    ``(model, variant)`` where variant selects the loss pairing:
    VQModelInterface -> "vq" (VQLPIPSWithDiscriminator semantics),
    AutoencoderKL -> "kl" (LPIPSWithDiscriminator, reference
    autoencoder.py:285-423 + contperceptual.py)."""
    fs = dict(cfg.diffusion.first_stage_config.params)
    fs.pop("ckpt_path", None)
    fs.pop("monitor", None)
    fs.pop("lossconfig", None)
    fs["ddconfig"] = dict(fs["ddconfig"])
    target = str(cfg.diffusion.first_stage_config.target)
    if target.rsplit(".", 1)[-1] == "AutoencoderKL":
        from stedm_tpu.models.autoencoder_kl import AutoencoderKL

        fs.pop("n_embed", None)
        return AutoencoderKL(dtype=dtype, **fs), "kl"
    return VQModelInterface(dtype=dtype, **fs), "vq"


def maybe_load_lpips(cfg):
    """Return (module, params) for the perceptual term, or (None, {}) when no
    taming LPIPS checkpoint is staged (the term is then disabled — random VGG
    features are not a perceptual metric)."""
    path = cfg.get("lpips_ckpt")
    if not path or float(cfg.loss.perceptual_weight) <= 0:
        if float(cfg.loss.perceptual_weight) > 0:
            print("lpips_ckpt not set: disabling the perceptual term "
                  "(stage taming vgg_lpips weights to enable)")
        return None, {}
    from stedm_tpu.models.lpips import LPIPS
    from stedm_tpu.utils.torch_import import (
        load_torch_state_dict,
        map_lpips,
        merge_loaded,
    )

    lpips = LPIPS()
    params = lpips.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    # comma-separated sources (taming vgg.pth carries only the lin heads; the
    # VGG16 backbone comes from the torchvision imagenet state_dict)
    for part in str(path).split(","):
        params = merge_loaded(params, map_lpips(load_torch_state_dict(part)))
    return lpips, params


def main(argv: list[str]) -> None:
    cfg = compose("config_ae", argv)
    import stedm_tpu

    stedm_tpu.enable_compile_cache()
    maybe_initialize_distributed()

    if cfg.data.batch_size is None:
        cfg.data.batch_size = cfg.data.batch_base * cfg.location.batch_mul
    mesh = build_mesh(dict(cfg.location.mesh))
    n_devices = mesh.devices.size
    global_batch = cfg.data.batch_size * n_devices
    accum = int(cfg.get("accumulate_grad_batches", 1))
    # taming lr rule: base_lr * accumulate * global batch
    lr = cfg.lr if cfg.get("lr") else float(cfg.base_lr) * accum * global_batch

    run_name = cfg.get("run_name") or f"ae_{cfg.data.name}"
    result_dir = f"{cfg.location.result_dir}/{run_name}"
    logger = EventLogger(result_dir, run_name,
                         use_wandb=cfg.location.get("wandb", False),
                         config=dict(cfg))
    print(f"devices={n_devices} global_batch={global_batch} lr={lr:.3e}")

    dm = DataModule(cfg)
    if jax.process_index() == 0:
        dm.prepare_data()
    dm.setup()

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.diffusion.get("compute_dtype", "float32")]
    model, variant = build_codec(cfg, dtype)
    loss_cfg = VAELossConfig(**{k: v for k, v in dict(cfg.loss).items()})
    lpips, lpips_params = maybe_load_lpips(cfg)
    if lpips is None:
        loss_cfg = VAELossConfig(**{**dict(cfg.loss), "perceptual_weight": 0.0})

    p = cfg.data.patch_size
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    gen_params = dict(model.init(rng, jnp.zeros((1, p, p, 3)))["params"])
    if variant == "kl":
        # trainable output log-variance rides in the generator tree (torch
        # keeps it on the loss module — contperceptual.py:20 — and feeds it to
        # optimizer 0, autoencoder.py:395-400)
        gen_params["lossvar"] = {
            "logvar": jnp.full((), float(loss_cfg.logvar_init), jnp.float32)}
    fs_ckpt = cfg.diffusion.first_stage_config.params.get("ckpt_path")
    if fs_ckpt:  # warm-start from the frozen diffusion codec checkpoint
        from pathlib import Path

        path = Path(f"{cfg.location.result_dir}/{fs_ckpt}")
        if path.is_dir():
            from stedm_tpu.train.checkpoints import restore_params

            gen_params = restore_params(path, gen_params)
        else:
            from stedm_tpu.utils.torch_import import (
                load_torch_state_dict,
                map_vq,
                merge_loaded,
            )

            sd = load_torch_state_dict(path)
            root = "first_stage_model." if any(
                k.startswith("first_stage_model.") for k in sd) else ""
            gen_params = merge_loaded(gen_params, map_vq(sd, root=root))
    disc = build_discriminator(loss_cfg)
    disc_vars = disc.init(jax.random.PRNGKey(cfg.get("seed", 0) + 1),
                          jnp.zeros((1, p, p, loss_cfg.disc_in_channels)))

    gen_tx, disc_tx = ae_optimizers(lr)
    state = create_ae_state(gen_params, disc_vars, gen_tx, disc_tx)

    rep = replicated(mesh)
    dp = batch_sharding(mesh)
    state = jax.device_put(state, rep)
    lpips_params = jax.device_put(lpips_params, rep)
    train_step = jax.jit(
        make_ae_train_step(model, loss_cfg, gen_tx, disc_tx, lpips=lpips,
                           variant=variant, seed=cfg.get("seed", 0)),
        in_shardings=(rep, dp, rep), out_shardings=(rep, rep, dp),
        donate_argnums=0)
    eval_step = jax.jit(make_ae_eval_step(model, loss_cfg, lpips=lpips,
                                          variant=variant),
                        in_shardings=(rep, dp, rep),
                        out_shardings=(rep, dp))

    loader = dm.train_loader(seed=cfg.get("seed", 0))
    loader.batch_size = global_batch
    val_loader = dm.val_loader()
    val_loader.batch_size = global_batch

    best_val = float("inf")
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        logs = []
        for np_batch in loader:
            img = np_batch[0]
            batch = shard_batch(mesh, {"img": np.asarray(img, np.float32)})
            state, log, _rec = train_step(state, batch["img"], lpips_params)
            logs.append(log)
        if logs:
            mean_log = {k: float(np.mean([float(l[k]) for l in logs]))
                        for k in logs[0]}
            mean_log.update(epoch=epoch, epoch_time_s=time.time() - t0)
            logger.log(mean_log, step=int(state.step))

        val_losses = []
        for np_batch in val_loader:
            img = np_batch[0]
            b = img.shape[0]
            if b % n_devices:
                img = np.concatenate(
                    [img, img[: n_devices - b % n_devices]])
            batch = shard_batch(mesh, {"img": np.asarray(img, np.float32)})
            metrics, _rec = eval_step(state.gen_params, batch["img"],
                                      lpips_params)
            val_losses.append({k: float(v) for k, v in metrics.items()})
        if val_losses:
            val_log = {k: float(np.mean([l[k] for l in val_losses]))
                       for k in val_losses[0]}
            logger.log(val_log, step=int(state.step))
            if jax.process_index() == 0:
                host_state = jax.device_get(state)
                checkpoints.save(result_dir + "/ckpt", host_state,
                                 name=f"{run_name}_last")
                if val_log["val/rec_loss"] < best_val:
                    best_val = val_log["val/rec_loss"]
                    checkpoints.save(result_dir + "/ckpt", host_state,
                                     name=f"{run_name}_best")

    logger.close()


if __name__ == "__main__":
    main(sys.argv[1:])
