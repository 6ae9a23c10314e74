#!/usr/bin/env python
"""Train the downstream segmentation network on real + synthetic data.

TPU rebuild of the reference entry point (reference `train_seg.py:34-97` +
`modules/segmentation.py`):
* MiT-B2 U-Net, loss = ce_ratio*CE + dice_ratio*Dice on border-cropped logits,
* run name defaults to the synthetic folder name (reference train_seg.py:41-45),
* global + per-patient confusion matrices (masked, ROI cut margins respected),
  tumor IoU / patient IoU mean+variance / subtype IoU logging
  (reference segmentation.py:135-334),
* best checkpoint on Val Loss (reference train_seg.py:74-76), final test runs on
  both last and best weights (reference train_seg.py:90-93).

Usage (reference README.md:50):
    python train_seg.py data=her2 data/dataset=[her2_anno,her2_syn] \
        data.ratios=[0.2,0.8] location.data_dir=/data
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from stedm_tpu.config import compose
from stedm_tpu.data.dm import DataModule
from stedm_tpu.models.segformer import SegUNet
from stedm_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)
from stedm_tpu.train import checkpoints
from stedm_tpu.train.optim import scaled_lr
from stedm_tpu.train.seg_steps import (
    create_seg_state,
    make_seg_eval_step,
    make_seg_train_step,
)
from stedm_tpu.utils import metrics as M
from stedm_tpu.utils.logging import EventLogger


def _epoch_metrics(prefix: str, cm: np.ndarray, inst_cms: np.ndarray | None,
                   logger: EventLogger, step: int, *, subtype_names=None,
                   image_list=None, name_idx: int = 0,
                   class_names=None) -> dict:
    out = {f"{prefix} IoU Score": M.tumor_iou(cm),
           f"{prefix} Subtype Var": M.subtype_variance(cm)}
    if class_names is not None and cm.sum() > 0:
        # CM image, BG-vs-tumor prediction columns against full label rows
        # (reference segmentation.py:159-160)
        import matplotlib.pyplot as plt

        norm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1e-10)
        fig = M.plot_confusion_matrix(norm[:, :2], ["BG", "Tumor"], class_names,
                                      title=f"{prefix} Conf Matrix")
        path = logger.run_dir / f"{prefix.lower().replace(' ', '_')}_cm_{step}.png"
        fig.savefig(path)
        plt.close(fig)
    if inst_cms is not None:
        patient_ious = [M.tumor_iou(c) for c in inst_cms if c.sum() > 0]
        if patient_ious:
            out[f"{prefix} Patient IoU Score"] = float(np.mean(patient_ious))
            out[f"{prefix} Patient IoU Var"] = float(np.var(patient_ious))
        # subtype IoU: group patient CMs by subtype substring in the image list
        # (reference segmentation.py:292-334)
        if subtype_names and image_list is not None:
            subtype_iou = []
            for subtype in subtype_names[1:]:
                cms = [inst_cms[i] for i, tup in enumerate(image_list)
                       if subtype in str(tup[name_idx])]
                if cms:
                    subtype_iou.append(M.tumor_iou(np.sum(cms, axis=0)))
            if subtype_iou:
                out[f"{prefix} Subtype IoU Score"] = float(np.mean(subtype_iou))
                out[f"{prefix} Subtype IoU Var"] = float(np.var(subtype_iou))
    logger.log(out, step=step)
    return out


def main(argv: list[str]) -> None:
    cfg = compose("config_seg", argv)
    import stedm_tpu

    stedm_tpu.enable_compile_cache()
    maybe_initialize_distributed()

    if cfg.data.batch_size is None:
        cfg.data.batch_size = cfg.data.batch_base * cfg.location.batch_mul
    mesh = build_mesh(dict(cfg.location.mesh))
    n_devices = mesh.devices.size
    lr = scaled_lr(cfg.base_lr, cfg.data.batch_base, cfg.location.batch_mul,
                   n_devices, cfg.lr)
    global_batch = cfg.data.batch_size * n_devices

    run_name = cfg.get("run_name") or None
    if run_name is None:
        syn = [n for n in cfg.data.dataset if n.endswith("_syn")]
        run_name = f"seg_{syn[0] if syn else cfg.data.name}"
    result_dir = f"{cfg.location.result_dir}/{run_name}"
    logger = EventLogger(result_dir, run_name,
                         use_wandb=cfg.location.get("wandb", False), config=dict(cfg))
    print(f"devices={n_devices} global_batch={global_batch} lr={lr:.3e}")

    dm = DataModule(cfg)
    if jax.process_index() == 0:
        dm.prepare_data()
    dm.setup()

    num_classes = cfg.data.num_classes
    model = SegUNet(classes=2, dtype=jnp.bfloat16
                    if cfg.get("compute_dtype", "bfloat16") == "bfloat16"
                    else jnp.float32)
    p = cfg.data.patch_size
    variables = model.init(jax.random.PRNGKey(cfg.get("seed", 0)),
                           jnp.zeros((1, p, p, 3)), False)

    # pretrained MiT-B2 encoder (reference modules/segmentation.py:41
    # ``encoder_weights="imagenet"``): `+encoder_ckpt=<path>` points at a staged
    # NVlabs mit_b2 / smp / Lightning torch checkpoint (no egress in this image)
    enc_ckpt = cfg.get("encoder_ckpt")
    if enc_ckpt:
        from stedm_tpu.utils.torch_import import load_seg_encoder

        variables = dict(variables)
        variables["params"] = load_seg_encoder(variables["params"], enc_ckpt)
    import optax

    tx = optax.MultiSteps(optax.adamw(lr),
                          every_k_schedule=cfg.get("accumulate_grad_batches", 4))
    state = create_seg_state(variables, tx)

    rep = replicated(mesh)
    dp = batch_sharding(mesh)
    state = jax.device_put(state, rep)
    train_step = jax.jit(
        make_seg_train_step(model, tx, num_classes=num_classes,
                            overlap=cfg.data.overlap_train,
                            ce_ratio=cfg.ce_ratio, dice_ratio=cfg.dice_ratio),
        in_shardings=(rep, dp, dp), out_shardings=rep, donate_argnums=0)
    eval_step_val = jax.jit(
        make_seg_eval_step(model, num_classes=num_classes,
                           num_inst=cfg.data.num_val_inst,
                           overlap=cfg.data.overlap_val,
                           ce_ratio=cfg.ce_ratio, dice_ratio=cfg.dice_ratio),
        in_shardings=(rep, dp, dp, dp, dp, dp), out_shardings=rep)
    eval_step_test = jax.jit(
        make_seg_eval_step(model, num_classes=num_classes,
                           num_inst=cfg.data.num_test_inst,
                           overlap=cfg.data.overlap_val,
                           ce_ratio=cfg.ce_ratio, dice_ratio=cfg.dice_ratio),
        in_shardings=(rep, dp, dp, dp, dp, dp), out_shardings=rep)

    def run_eval(loader, eval_step, num_inst):
        cm = np.zeros((num_classes, num_classes))
        inst = np.zeros((num_inst, num_classes, num_classes))
        losses = []
        variables_eval = {"params": state.params, "batch_stats": state.batch_stats}
        patch = cfg.data.patch_size
        for np_batch in loader:
            img, _one_hot, seg, cuts, wsi_nr = np_batch[:5]
            cut_y, cut_x = np.asarray(cuts[0]), np.asarray(cuts[1])
            b = img.shape[0]
            if b % n_devices:
                # pad the ragged tail for even sharding; padded rows get a full-size
                # cut margin so their border mask is empty -> zero CM contribution
                pad = n_devices - b % n_devices
                img = np.concatenate([img, img[:pad]])
                seg = np.concatenate([seg, seg[:pad]])
                cut_y = np.concatenate([cut_y, np.full(pad, patch, cut_y.dtype)])
                cut_x = np.concatenate([cut_x, np.full(pad, patch, cut_x.dtype)])
                wsi_nr = np.concatenate([wsi_nr, np.zeros(pad, wsi_nr.dtype)])
            out = eval_step(variables_eval, jnp.asarray(img), jnp.asarray(seg),
                            jnp.asarray(cut_y), jnp.asarray(cut_x),
                            jnp.asarray(wsi_nr))
            losses.append(float(out["loss"]))
            cm += np.asarray(out["cm"])
            inst += np.asarray(out["inst_cm"])
        return float(np.mean(losses)) if losses else float("nan"), cm, inst

    loader = dm.train_loader(seed=cfg.get("seed", 0))
    loader.batch_size = global_batch
    val_loader = dm.val_loader()
    val_loader.batch_size = global_batch

    best_val = float("inf")
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        losses, cm_train = [], np.zeros((num_classes, num_classes))
        for np_batch in loader:
            img, _oh, seg = np_batch[0], np_batch[1], np_batch[2]
            batch = shard_batch(mesh, {"img": img, "seg": seg})
            state, metrics_out = train_step(state, batch["img"], batch["seg"])
            losses.append(metrics_out["loss"])
            cm_train += np.asarray(metrics_out["cm"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        logger.log({"Train Loss": train_loss, "epoch": epoch,
                    "epoch_time_s": time.time() - t0}, step=int(state.step))
        _epoch_metrics("Train", cm_train, None, logger, int(state.step),
                       class_names=list(cfg.data.classes))

        if len(val_loader) > 0:
            val_loss, cm_val, inst_val = run_eval(val_loader, eval_step_val,
                                                  cfg.data.num_val_inst)
            logger.log({"Val Loss": val_loss}, step=int(state.step))
            _epoch_metrics("Val", cm_val, inst_val, logger, int(state.step),
                           class_names=list(cfg.data.classes))
            if jax.process_index() == 0:
                host_state = jax.device_get(state)
                checkpoints.save(result_dir + "/ckpt", host_state,
                                 name=f"{run_name}_last")
                if val_loss < best_val:
                    best_val = val_loss
                    checkpoints.save(result_dir + "/ckpt", host_state,
                                     name=f"{run_name}_best")

    # test twice: last weights, then best (reference train_seg.py:90-93)
    test_loader = dm.test_loader()
    test_loader.batch_size = global_batch
    if len(test_loader) > 0:
        for tag in ("last", "best"):
            try:
                state = checkpoints.restore(result_dir + "/ckpt",
                                            jax.device_get(state),
                                            name=f"{run_name}_{tag}")
            except Exception:
                continue
            state = jax.device_put(state, rep)
            _loss, cm_test, inst_test = run_eval(test_loader, eval_step_test,
                                                 cfg.data.num_test_inst)
            _epoch_metrics(f"Test ({tag})", cm_test, inst_test, logger,
                           int(state.step))

    logger.close()


if __name__ == "__main__":
    main(sys.argv[1:])
