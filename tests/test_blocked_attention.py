"""Blocked SDPA (ops/blocked_attention.py) vs the exact parity path.

The chunked form must reproduce the exact path's per-row math (full-key fp32
softmax, reference openaimodel.py:388-391) to float tolerance in both the
forward and the backward, for divisible and non-divisible T; the flash form
is TPU-only (stock Pallas kernel) and is exercised on-chip by
tools/bench_train.py --attn flash, so here it only gets a dispatch test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.ops.blocked_attention import (chunked_sdpa, flash_ok, sdpa)


def _qkv(key, b=2, h=3, t=96, d=16, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, h, t, d), dtype)
    return mk(kq), mk(kk), mk(kv)


SCALE = 1.0 / np.sqrt(np.sqrt(16))


@pytest.mark.parametrize("t,q_chunk", [(96, 32), (100, 32), (64, 256), (128, 48)])
def test_chunked_matches_exact_forward(t, q_chunk):
    q, k, v = _qkv(jax.random.PRNGKey(0), t=t)
    exact = sdpa(q, k, v, SCALE, impl="exact")
    chunked = chunked_sdpa(q, k, v, SCALE, q_chunk=q_chunk)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(exact),
                               rtol=1e-6, atol=1e-6)


def test_chunked_matches_exact_grad():
    q, k, v = _qkv(jax.random.PRNGKey(1), t=96)

    def loss(impl):
        def f(q, k, v):
            out = sdpa(q, k, v, SCALE, impl=impl, q_chunk=32)
            return jnp.sum(jnp.sin(out))
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    ge, gc = loss("exact"), loss("chunked")
    for a, b in zip(ge, gc):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_chunked_bf16_close_to_exact():
    q, k, v = _qkv(jax.random.PRNGKey(2), t=128, dtype=jnp.bfloat16)
    exact = sdpa(q, k, v, SCALE, impl="exact")
    chunked = sdpa(q, k, v, SCALE, impl="chunked", q_chunk=32)
    assert chunked.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(chunked, dtype=np.float32),
                               np.asarray(exact, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)


def test_auto_resolves_off_tpu_to_chunked():
    # the test mesh is CPU (conftest), so auto must take the portable path
    assert jax.default_backend() == "cpu"
    q, k, v = _qkv(jax.random.PRNGKey(3), t=128)
    auto = jax.jit(lambda q, k, v: sdpa(q, k, v, SCALE, impl="auto"))(q, k, v)
    exact = sdpa(q, k, v, SCALE, impl="exact")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(exact),
                               rtol=1e-6, atol=1e-6)


def test_flash_ok_shape_gate():
    assert flash_ok(1024, 128)          # the 512^2 bottleneck: T=1024, dh=128
    assert flash_ok(256, 64)
    assert not flash_ok(100, 128)       # un-tileable T
    assert not flash_ok(64, 128)        # below MIN_BLOCK_SIZE


def test_unknown_impl_raises():
    q, k, v = _qkv(jax.random.PRNGKey(4), t=64)
    with pytest.raises(ValueError, match="unknown attn impl"):
        sdpa(q, k, v, SCALE, impl="bogus")


def test_attention_block_impl_parity():
    """Module-level: AttentionBlock(attn_impl='chunked') must reproduce the
    exact path with the SAME params (the importer layout is untouched)."""
    from stedm_tpu.models.attention import AttentionBlock

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 32))
    blk_e = AttentionBlock(num_heads=4)
    params = blk_e.init(jax.random.PRNGKey(6), x)
    out_e = blk_e.apply(params, x)
    out_c = AttentionBlock(num_heads=4, attn_impl="chunked").apply(params, x)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_e),
                               rtol=1e-6, atol=1e-6)


def test_unet_chunked_grad_under_remat():
    """attn_impl flows through UNet; chunked + use_checkpoint (nn.remat around
    the checkpointed scan) stays differentiable and matches exact grads."""
    from stedm_tpu.models.unet import UNet

    kw = dict(image_size=16, in_channels=4, out_channels=3, model_channels=32,
              num_res_blocks=1, channel_mult=(1, 2), num_heads=2,
              attention_resolutions=(1, 2), context_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 4))
    ts = jnp.array([3, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(8), (2, 128))  # 4*model_channels

    ref = UNet(**kw)
    params = ref.init(jax.random.PRNGKey(9), x, ts, ctx)

    def loss(p, impl, remat):
        net = UNet(**kw, attn_impl=impl, use_checkpoint=remat)
        return jnp.sum(net.apply(p, x, ts, ctx) ** 2)

    out_e = loss(params, "exact", False)
    out_c = loss(params, "chunked", True)
    np.testing.assert_allclose(float(out_c), float(out_e), rtol=1e-5)

    g_e = jax.grad(loss)(params, "exact", False)
    g_c = jax.grad(loss)(params, "chunked", True)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_e)[0],
            jax.tree_util.tree_flatten_with_path(g_c)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))
