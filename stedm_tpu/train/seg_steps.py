"""Jittable train/eval steps for the downstream segmentation model.

Functional port of the reference's `Segmentation` LightningModule steps
(reference `modules/segmentation.py:77-132`): CE+Dice on border-cropped logits,
confusion matrices accumulated globally and per patient/WSI instance. Border
cropping becomes a static-shape validity mask so the whole step jits; per-instance
CMs are scatter-adds into a [num_inst, C, C] buffer that lives in the eval state.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stedm_tpu.utils.metrics import border_mask, confusion_matrix, seg_loss


class SegTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_seg_state(variables: dict, tx: optax.GradientTransformation) -> SegTrainState:
    return SegTrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                         batch_stats=variables.get("batch_stats", {}),
                         opt_state=tx.init(variables["params"]))


def make_seg_train_step(model, tx, *, num_classes: int, overlap: int,
                        ce_ratio: float = 0.1, dice_ratio: float = 0.9) -> Callable:
    """batch: (img [B,P,P,3], one_hot [B,P,P,C], seg [B,P,P] int)."""

    def train_step(state: SegTrainState, img, seg):
        seg_bin = (seg > 0).astype(jnp.int32)
        one_hot2 = jax.nn.one_hot(seg_bin, 2, dtype=jnp.float32)

        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, img, True,
                mutable=["batch_stats"])
            o = overlap
            crop = (slice(None), slice(o, -o), slice(o, -o), slice(None))
            loss = seg_loss(logits[crop], one_hot2[crop],
                            ce_ratio=ce_ratio, dice_ratio=dice_ratio)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        pred = jnp.argmax(logits, axis=-1)
        o = overlap
        cm = confusion_matrix(pred[:, o:-o, o:-o], seg[:, o:-o, o:-o], num_classes)
        new_state = SegTrainState(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"loss": loss, "cm": cm}

    return train_step


def make_seg_eval_step(model, *, num_classes: int, num_inst: int, overlap: int,
                       ce_ratio: float = 0.1, dice_ratio: float = 0.9) -> Callable:
    """batch: (img, one_hot, seg, (cut_y, cut_x), wsi_nr). Returns per-batch loss,
    the masked global CM and per-instance CM increments."""

    def eval_step(variables, img, seg, cut_y, cut_x, wsi_nr):
        logits = model.apply(variables, img, False)
        seg_bin = (seg > 0).astype(jnp.int32)
        one_hot2 = jax.nn.one_hot(seg_bin, 2, dtype=jnp.float32)
        o = overlap
        crop = (slice(None), slice(o, -o), slice(o, -o), slice(None))
        loss = seg_loss(logits[crop], one_hot2[crop],
                        ce_ratio=ce_ratio, dice_ratio=dice_ratio)

        pred = jnp.argmax(logits, axis=-1)
        mask = border_mask(pred.shape[1:], overlap, cut_y, cut_x)

        def per_sample(p, lbl, m):
            return confusion_matrix(p, lbl, num_classes, mask=m)

        cms = jax.vmap(per_sample)(pred, seg, mask)         # [B, C, C]
        cm_total = cms.sum(axis=0)
        inst_cm = jnp.zeros((num_inst, num_classes, num_classes),
                            jnp.float32).at[wsi_nr.astype(jnp.int32)].add(cms)
        return {"loss": loss, "cm": cm_total, "inst_cm": inst_cm}

    return eval_step
