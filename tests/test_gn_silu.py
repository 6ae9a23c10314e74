"""Fused GroupNorm(+add|+FiLM)(+SiLU) op: numerics vs flax composite, Pallas
kernel (interpret mode) vs reference, gradients vs autodiff, and module
param-path compatibility with the `nn.GroupNorm`-wrapped original."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from stedm_tpu.ops.gn_silu import _gn_silu_pallas, gn_silu, gn_silu_reference

B, H, W, C, G = 2, 8, 8, 128, 32


@pytest.fixture(scope="module")
def data():
    r = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(r.normal(size=(B, H, W, C)), jnp.float32),
        gamma=jnp.asarray(r.normal(1, 0.1, (C,)), jnp.float32),
        beta=jnp.asarray(r.normal(0, 0.1, (C,)), jnp.float32),
        add=jnp.asarray(r.normal(size=(B, C)), jnp.float32),
        fs=jnp.asarray(r.normal(0, 0.1, (B, C)), jnp.float32),
        fsh=jnp.asarray(r.normal(0, 0.1, (B, C)), jnp.float32),
    )


def _flax_composite(d, add=None, film=False, apply_silu=True):
    gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
    params = {"params": {"scale": d["gamma"], "bias": d["beta"]}}
    x = d["x"] + (add[:, None, None, :] if add is not None else 0.0)
    y = gn.apply(params, x)
    if film:
        y = y * (1 + d["fs"][:, None, None, :]) + d["fsh"][:, None, None, :]
    return jax.nn.silu(y) if apply_silu else y


def test_matches_flax_groupnorm(data):
    got = gn_silu(data["x"], data["gamma"], data["beta"])
    np.testing.assert_allclose(got, _flax_composite(data), atol=1e-5)


def test_fused_add(data):
    got = gn_silu(data["x"], data["gamma"], data["beta"], add=data["add"])
    np.testing.assert_allclose(got, _flax_composite(data, add=data["add"]),
                               atol=1e-5)


def test_fused_film(data):
    got = gn_silu(data["x"], data["gamma"], data["beta"],
                  film_scale=data["fs"], film_shift=data["fsh"])
    np.testing.assert_allclose(got, _flax_composite(data, film=True), atol=1e-5)


def test_no_silu(data):
    got = gn_silu(data["x"], data["gamma"], data["beta"], apply_silu=False)
    np.testing.assert_allclose(got, _flax_composite(data, apply_silu=False),
                               atol=1e-5)


@pytest.mark.parametrize("mode", ["plain", "add", "film"])
def test_pallas_kernel_interpret(data, mode):
    add = data["add"] if mode == "add" else None
    fs = data["fs"] if mode == "film" else None
    fsh = data["fsh"] if mode == "film" else None
    got = _gn_silu_pallas(data["x"], data["gamma"], data["beta"], add, fs, fsh,
                          groups=G, eps=1e-5, apply_silu=True, interpret=True)
    want = gn_silu_reference(data["x"], data["gamma"], data["beta"], add, fs,
                             fsh, groups=G, eps=1e-5, apply_silu=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_kernel_bf16_interpret(data):
    x16 = data["x"].astype(jnp.bfloat16)
    got = _gn_silu_pallas(x16, data["gamma"], data["beta"], None, None, None,
                          groups=G, eps=1e-5, apply_silu=True, interpret=True)
    want = gn_silu_reference(x16, data["gamma"], data["beta"],
                             groups=G, eps=1e-5, apply_silu=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(got.astype(jnp.float32),
                               want.astype(jnp.float32), atol=3e-2)


def test_grad_matches_autodiff(data):
    def f_fused(x, gamma, beta, add):
        return jnp.sum(jnp.sin(gn_silu(x, gamma, beta, add=add)))

    def f_ref(x, gamma, beta, add):
        gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
        y = gn.apply({"params": {"scale": gamma, "bias": beta}},
                     x + add[:, None, None, :])
        return jnp.sum(jnp.sin(jax.nn.silu(y)))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(
        data["x"], data["gamma"], data["beta"], data["add"])
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(
        data["x"], data["gamma"], data["beta"], data["add"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_grad_film_matches_autodiff(data):
    def f_fused(x, gamma, beta, fs, fsh):
        return jnp.sum(jnp.cos(gn_silu(x, gamma, beta, film_scale=fs,
                                       film_shift=fsh)))

    def f_ref(x, gamma, beta, fs, fsh):
        gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
        y = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
        y = y * (1 + fs[:, None, None, :]) + fsh[:, None, None, :]
        return jnp.sum(jnp.cos(jax.nn.silu(y)))

    args = (data["x"], data["gamma"], data["beta"], data["fs"], data["fsh"])
    g1 = jax.grad(f_fused, argnums=tuple(range(5)))(*args)
    g2 = jax.grad(f_ref, argnums=tuple(range(5)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_custom_vjp_backward_matches_autodiff(data):
    """The hand-written VJP (used when the Pallas kernel is the forward) must
    match autodiff of the reference formulation; exercised on CPU by routing
    the custom_vjp's forward through the interpreted kernel."""
    import functools

    from stedm_tpu.ops import gn_silu as mod

    orig = mod._gn_silu_pallas
    mod._gn_silu_pallas = functools.partial(orig, interpret=True)
    try:
        def f_fused(x, gamma, beta, add):
            return jnp.sum(jnp.sin(mod._gn_silu(x, gamma, beta, add, None,
                                                None, G, 1e-5, True)))

        def f_ref(x, gamma, beta, add):
            return jnp.sum(jnp.sin(gn_silu_reference(
                x, gamma, beta, add, groups=G, eps=1e-5, apply_silu=True)))

        args = (data["x"], data["gamma"], data["beta"], data["add"])
        g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(*args)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, atol=2e-4)
    finally:
        mod._gn_silu_pallas = orig


def test_module_param_path(data):
    """GNSiLU must produce the exact GroupNorm32 param tree (<name>/norm/*)."""
    from stedm_tpu.models.layers import GNSiLU, GroupNorm32

    m_new = GNSiLU(name="in_norm")
    m_old = GroupNorm32(name="in_norm")
    p_new = m_new.init(jax.random.PRNGKey(0), data["x"])
    p_old = m_old.init(jax.random.PRNGKey(0), data["x"])
    assert jax.tree_util.tree_structure(p_new) == jax.tree_util.tree_structure(p_old)
    got = m_new.apply(p_new, data["x"])
    want = jax.nn.silu(m_old.apply(p_old, data["x"]))
    np.testing.assert_allclose(got, want, atol=1e-5)
