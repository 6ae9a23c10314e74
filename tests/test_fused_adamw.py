"""Parity tests: the flat-buffer fused AdamW must match stock optax.adamw.

The fused optimizer (stedm_tpu/train/fused_adamw.py, VERDICT r4 task 2b) is
an opt-in `make_optimizer` inner transform — a measured NEGATIVE on the v5e
TPU (see its module docstring / BASELINE.md round-5), kept like gn_silu with
its correctness pinned: identical updates to optax.adamw (fp32 moments),
identical frozen-group behavior under multi_transform, identical
accumulation under MultiSteps, and a bounded deviation for the bf16
first-moment option.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from stedm_tpu.train.fused_adamw import FusedAdamWState, fused_adamw
from stedm_tpu.train.optim import make_optimizer


def _tree(seed=0, scale=1.0):
    r = np.random.default_rng(seed)
    return {
        "unet": {"conv": {"kernel": jnp.asarray(r.normal(0, scale, (3, 3, 4, 8)),
                                                jnp.float32),
                          "bias": jnp.asarray(r.normal(0, scale, (8,)),
                                              jnp.float32)},
                 "norm": {"scale": jnp.ones((4,), jnp.float32)}},
        "cond_stage": {"w": jnp.asarray(r.normal(0, scale, (5, 7)), jnp.float32)},
        "agg": {"w": jnp.asarray(r.normal(0, scale, (7,)), jnp.float32)},
        "first_stage": {"w": jnp.asarray(r.normal(0, scale, (6, 2)), jnp.float32)},
    }


def _grads(params, seed):
    r = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.normal(0, 0.1, p.shape), jnp.float32), params)


def test_matches_optax_adamw_exactly():
    params = _tree()["unet"]
    tx_ref = optax.adamw(1e-3, weight_decay=0.01)
    tx_fused = fused_adamw(1e-3, weight_decay=0.01)
    s_ref, s_fused = tx_ref.init(params), tx_fused.init(params)
    p_ref = p_fused = params
    for i in range(5):
        g = _grads(params, 100 + i)
        u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
        u_fused, s_fused = tx_fused.update(g, s_fused, p_fused)
        for a, b in zip(jax.tree_util.tree_leaves(u_ref),
                        jax.tree_util.tree_leaves(u_fused)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-8)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fused = optax.apply_updates(p_fused, u_fused)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-8)


def test_make_optimizer_fused_matches_unfused_with_frozen_groups():
    params = _tree(1)
    tx_f = make_optimizer(1e-2, accumulate_grad_batches=1, fused=True)
    tx_o = make_optimizer(1e-2, accumulate_grad_batches=1, fused=False)
    s_f, s_o = tx_f.init(params), tx_o.init(params)
    for i in range(3):
        g = _grads(params, 200 + i)
        u_f, s_f = tx_f.update(g, s_f, params)
        u_o, s_o = tx_o.update(g, s_o, params)
        # frozen first_stage gets exact zeros in both
        assert float(jnp.abs(u_f["first_stage"]["w"]).max()) == 0.0
        for a, b in zip(jax.tree_util.tree_leaves(u_o),
                        jax.tree_util.tree_leaves(u_f)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-8)
        params = optax.apply_updates(params, u_f)


def test_fused_under_multisteps_accumulates_identically():
    params = _tree(2)
    tx_f = make_optimizer(1e-2, accumulate_grad_batches=2, fused=True)
    tx_o = make_optimizer(1e-2, accumulate_grad_batches=2, fused=False)
    s_f, s_o = tx_f.init(params), tx_o.init(params)
    for i in range(4):  # two full accumulation cycles
        g = _grads(params, 300 + i)
        u_f, s_f = tx_f.update(g, s_f, params)
        u_o, s_o = tx_o.update(g, s_o, params)
        for a, b in zip(jax.tree_util.tree_leaves(u_o),
                        jax.tree_util.tree_leaves(u_f)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-8)
        params = optax.apply_updates(params, u_f)


def test_style_encoder_trainable_false_freezes_agg():
    params = _tree(3)
    tx = make_optimizer(1e-2, style_encoder_trainable=False, fused=True,
                        accumulate_grad_batches=1)
    s = tx.init(params)
    u, _ = tx.update(_grads(params, 7), s, params)
    assert float(jnp.abs(u["agg"]["w"]).max()) == 0.0
    assert float(jnp.abs(u["unet"]["conv"]["kernel"]).max()) > 0.0


def test_bf16_first_moment_close_and_half_footprint():
    params = _tree(4)["unet"]
    tx32 = fused_adamw(1e-3)
    tx16 = fused_adamw(1e-3, m_dtype=jnp.bfloat16)
    s32, s16 = tx32.init(params), tx16.init(params)
    assert s16.m.dtype == jnp.bfloat16 and s16.v.dtype == jnp.float32
    p32 = p16 = params
    for i in range(5):
        g = _grads(params, 400 + i)
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(p16)):
        # bf16 m: ~2^-9 relative rounding on the first moment -> small drift
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-4)


def test_state_is_flat_and_jit_compatible():
    params = _tree(5)
    tx = make_optimizer(1e-3, accumulate_grad_batches=1, fused=True)
    s = tx.init(params)

    @jax.jit
    def step(s, params, g):
        u, s = tx.update(g, s, params)
        return optax.apply_updates(params, u), s

    p2, s2 = step(s, params, _grads(params, 9))
    # the inner state is ONE flat buffer pair sized to the trainable leaves
    inner = [x for x in jax.tree_util.tree_leaves(s2) if x.ndim == 1]
    n_train = sum(int(np.prod(p.shape)) for k in ("unet", "cond_stage", "agg")
                  for p in jax.tree_util.tree_leaves(params[k]))
    assert any(x.size == n_train for x in inner)
    assert jnp.isfinite(jax.tree_util.tree_leaves(p2)[0]).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
