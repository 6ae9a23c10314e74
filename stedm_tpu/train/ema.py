"""Exponential moving average of parameters.

Functional port of the reference's `LitEma` (reference `ldm/modules/ema.py:25-44`):
decay ramps as ``min(max_decay, (1 + n) / (10 + n))`` where ``n`` counts updates, and
the shadow update is ``shadow -= (1 - decay) * (shadow - param)``. The reference
updates after every train batch, including gradient-accumulation micro-batches
(`modules/ldm_diffusion.py:114-115`); callers here do the same.

The EMA covers the trainable denoiser parameters only (the reference's LitEma wraps
the DiffusionWrapper, ddpm.py:91-94). Kept in the train state for checkpoint parity
even though previews/predict default to raw weights (SURVEY.md Q8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(num_updates: jnp.ndarray, max_decay: float = 0.9999) -> jnp.ndarray:
    n = num_updates.astype(jnp.float32)
    return jnp.minimum(jnp.asarray(max_decay, jnp.float32), (1.0 + n) / (10.0 + n))


def ema_update(shadow, params, num_updates: jnp.ndarray, max_decay: float = 0.9999):
    """One EMA step; returns (new_shadow, new_num_updates)."""
    decay = ema_decay(num_updates, max_decay)
    one_minus = 1.0 - decay
    new_shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)), shadow, params)
    return new_shadow, num_updates + 1
