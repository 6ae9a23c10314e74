"""Optimizer construction with the reference's trainability policy.

AdamW at a flat lr (reference `modules/ldm_diffusion.py:224-233`: no scheduler on the
active path, SURVEY.md §2.4 "LR schedulers dead"). Trainable groups: the U-Net, the
cond stage (SpatialRescaler), and — governed by ``style_encoder_trainable`` — the
style branch. The frozen VQ first stage receives zero updates. ``set_to_zero`` (not
masking) keeps the param tree structure intact for checkpointing.

SURVEY.md Q1: the reference *accidentally* leaves the style encoder out of the
optimizer (`ldm_diffusion.py:230-231` checks for a module name that never exists);
``style_encoder_trainable=False`` reproduces that for parity runs, the default trains
it as the paper intends.

The reference's lr rule (train_diff.py:36-39): lr = base_lr * batch_base * batch_mul
* n_devices; gradient accumulation x4 via `optax.MultiSteps` mirrors
``accumulate_grad_batches=4`` (train_diff.py:76).
"""

from __future__ import annotations

import optax


def scaled_lr(base_lr: float, batch_base: int, batch_mul: int, n_devices: int,
              lr_override: float | None = None) -> float:
    if lr_override is not None:
        return float(lr_override)
    return float(base_lr) * batch_base * batch_mul * n_devices


def make_optimizer(lr: float, *, style_encoder_trainable: bool = True,
                   accumulate_grad_batches: int = 1,
                   weight_decay: float = 0.01,
                   clip_grad_norm: float | None = None,
                   fused: bool = False,
                   m_dtype=None) -> optax.GradientTransformation:
    """AdamW over trainable groups; frozen groups get zero updates.

    Expects the STEDM param tree's top-level keys: unet / cond_stage / agg /
    first_stage. ``clip_grad_norm`` adds global-norm clipping (off by default —
    the reference has none).

    ``fused=True`` swaps in the flat-buffer fused AdamW
    (`train/fused_adamw.py`) — numerically identical to `optax.adamw`
    (parity-tested) and a MEASURED NEGATIVE on the v5e terminal (BASELINE.md
    round-5 training table: 8.87 vs 20.79 samples/s at accum 4 — flattening
    ~500 tile-layouted leaves into one 1-D buffer forces a relayout pass per
    apply, and the donated accum-1 variant blew past a 50-min remote
    compile). Kept off by default, like ops/gn_silu.py; the flag remains for
    CPU experiments and future runtimes. ``m_dtype`` optionally stores the
    fused first moment in bf16 (second moment stays fp32 — see
    fused_adamw.py for why bf16 `v` silently stops updating).
    """

    from stedm_tpu.models.stedm import FROZEN_PARAM_GROUPS

    def label(params) -> dict:
        labels = {}
        for key in params:
            if key in FROZEN_PARAM_GROUPS:
                labels[key] = "frozen"
            elif key == "agg":
                labels[key] = "train" if style_encoder_trainable else "frozen"
            else:
                labels[key] = "train"
        return labels

    if fused:
        from stedm_tpu.train.fused_adamw import fused_adamw

        inner = fused_adamw(lr, weight_decay=weight_decay, m_dtype=m_dtype)
    else:
        # m_dtype maps to optax's mu_dtype: bf16 FIRST moment storage in the
        # native per-leaf layout (no relayout cost; second moment stays fp32
        # — see fused_adamw.py for why bf16 `nu` is a trap)
        inner = optax.adamw(lr, weight_decay=weight_decay, mu_dtype=m_dtype)
    if clip_grad_norm:
        inner = optax.chain(optax.clip_by_global_norm(clip_grad_norm), inner)
    tx = optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()},
        label)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           min_lr: float = 0.0):
    """Lambda-style warmup-cosine lr schedule (reference `ldm/lr_scheduler.py`
    `LambdaWarmUpCosineScheduler` — dead on the reference's active path, kept for
    surface completeness)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr)


def warmup_linear_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           min_lr: float = 0.0):
    """(reference ldm/lr_scheduler.py `LambdaLinearScheduler` equivalent)"""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
         optax.linear_schedule(base_lr, min_lr,
                               max(total_steps - warmup_steps, 1))],
        [max(warmup_steps, 1)])
