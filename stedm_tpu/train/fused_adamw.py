"""Flat-buffer fused AdamW: the whole update is ONE elementwise pass.

**MEASURED NEGATIVE on TPU — off by default** (BASELINE.md round-5 training
table, v5e via tunnel): at 512^2/accum 4 the flat apply ran 8.87 vs stock
optax's 20.79 samples/s, and the donated accum-1 variant blew past a 50-min
remote compile. The hypothesis (kill ~500 per-leaf kernels, ~320 ms/step by
the round-4 accum1/accum4 delta) ignored that every leaf lives in a tiled
TPU layout: `ravel`+`concatenate` into a 1-D buffer forces a relayout pass
per leaf per apply — on this runtime that costs far more than the per-leaf
kernel overhead it removes, and the 500-slice/concat graph with donation
explodes XLA's buffer assignment. Kept (with its parity tests) as the
documented dead end, like ops/gn_silu.py: revisit only on a runtime where
relayouts are cheap or XLA concatenates lazily.

The original rationale (VERDICT r4 task 2b, BASELINE.md round-4 table): the
stock `optax.adamw` apply over the flagship's ~500-leaf / 318M-param tree
costs ~320 ms on the v5e terminal — ~15x more than the actual HBM traffic
justifies — so one fusion over ~1 GB looked like it would buy back hundreds
of per-leaf kernels for two extra passes (concat the grads, split the
updates).

Semantics match `optax.adamw(lr, b1, b2, eps, weight_decay)` exactly when the
moment dtypes are fp32 (parity-tested against optax in
tests/test_fused_adamw.py). ``m_dtype=jnp.bfloat16`` halves the first-moment
traffic/footprint at ~2^-9 relative rounding noise on a quantity with a 0.1
per-step increment — safe. The SECOND moment stays fp32 by default and should
stay that way: with b2=0.999 the per-step increment is ~1e-3 of the running
value, below bf16's 2^-8 half-ulp, so a bf16 ``v`` stops updating entirely in
steady state (round-to-nearest eats the increment). ``v_dtype`` exists for
experiments but is documented-dangerous.

Drop-in: a `optax.GradientTransformation`, composes with `optax.masked` /
`multi_transform` (MaskedNode subtrees have no leaves, so they fall out of
the flattening naturally) and `optax.MultiSteps`.

Reference counterpart being accelerated: torch.optim.AdamW over the same
param groups (reference modules/ldm_diffusion.py:224-233); torch fuses this
with its own foreach/fused kernels on CUDA — this is the TPU equivalent.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    m: jnp.ndarray      # flat first moment, len = sum of trainable leaf sizes
    v: jnp.ndarray      # flat second moment


def _flatten(tree) -> jnp.ndarray:
    """Concatenate all leaves (f32) into one 1-D buffer. MaskedNode subtrees
    contribute no leaves. Empty trees yield a zero-length buffer."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(
        [jnp.ravel(leaf).astype(jnp.float32) for leaf in leaves])


def _unflatten_like(flat: jnp.ndarray, tree):
    """Split a flat buffer back into `tree`'s structure/shapes/dtypes."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out, off = [], 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape))
        out.append(flat[off:off + n].reshape(leaf.shape).astype(leaf.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def fused_adamw(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8, weight_decay: float = 0.01,
                m_dtype: Any = None, v_dtype: Any = None
                ) -> optax.GradientTransformation:
    """AdamW with decoupled weight decay over ONE flat buffer.

    ``m_dtype``/``v_dtype`` set the STORAGE dtype of the moments (compute is
    always fp32); None keeps fp32. See the module docstring for why bf16 is
    fine for ``m`` and a trap for ``v``.
    """
    lr = float(learning_rate)
    m_dtype = m_dtype or jnp.float32
    v_dtype = v_dtype or jnp.float32

    def init(params) -> FusedAdamWState:
        n = sum(int(np.prod(p.shape)) if p.ndim else 1
                for p in jax.tree_util.tree_leaves(params))
        return FusedAdamWState(count=jnp.zeros((), jnp.int32),
                               m=jnp.zeros((n,), m_dtype),
                               v=jnp.zeros((n,), v_dtype))

    def update(updates, state: FusedAdamWState, params=None):
        if params is None:
            raise ValueError("fused_adamw (like optax.adamw) needs params "
                             "for the decoupled weight decay")
        g = _flatten(updates)
        p = _flatten(params)
        count = state.count + 1
        cf = count.astype(jnp.float32)
        m = state.m.astype(jnp.float32) * b1 + (1.0 - b1) * g
        v = state.v.astype(jnp.float32) * b2 + (1.0 - b2) * jnp.square(g)
        # bias-corrected step, matching optax.scale_by_adam (eps_root=0):
        # update = m_hat / (sqrt(v_hat) + eps)
        m_hat = m / (1.0 - jnp.power(b1, cf))
        v_hat = v / (1.0 - jnp.power(b2, cf))
        upd = -lr * (m_hat / (jnp.sqrt(v_hat) + eps) + weight_decay * p)
        new_state = FusedAdamWState(count=count, m=m.astype(m_dtype),
                                    v=v.astype(v_dtype))
        return _unflatten_like(upd, updates), new_state

    return optax.GradientTransformation(init, update)
