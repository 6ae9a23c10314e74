"""Blocked self-attention for the legacy AttentionBlock bottleneck.

The reference's ``QKVAttentionLegacy`` (reference openaimodel.py:378-394)
materializes the full ``[B*H, T, T]`` attention matrix. At 512^2 training the
bottleneck runs T=1024, and the fp32 logits/softmax temps
(``f32[32,8,1024,1024]`` in the round-5 batch-32 OOM dump) are the largest
live allocations even with every ResBlock and the attention block itself
rematerialized — remat re-runs the block's forward under grad, so the full
[T, T] slab still exists during the recompute+backward window.

Two TPU-native blocked forms, selected by ``UNet.attn_impl`` (default
``"exact"`` keeps the bit-stable parity path):

* ``chunked`` — ``lax.scan`` over query chunks with a ``jax.checkpoint``-ed
  body. Each row still takes its fp32 softmax over the FULL key axis, i.e.
  the per-row math is identical to the exact path and outputs agree to float
  tolerance; but neither forward nor backward ever holds more than one
  ``[chunk, T]`` logits slab per (B, H). Runs on every backend (the CPU test
  mesh included), so it is also the portable fallback for ``auto``.
* ``flash`` — the stock Pallas TPU flash-attention kernel
  (``jax.experimental.pallas.ops.tpu.flash_attention``: online softmax, fp32
  accumulators, dedicated fwd/bwd kernels behind a custom VJP). The
  reference scales q and k by ``1/sqrt(sqrt(dh))`` each *before* the matmul
  (openaimodel.py:388); here the product ``1/sqrt(dh)`` is folded into the
  kernel's post-matmul ``sm_scale``, which under bf16 inputs is numerically
  tighter than pre-scaling (no rounding of q*s, k*s).

``auto`` resolves at trace time: flash when the default backend is TPU and
the shape tiles onto the kernel (T a multiple of 128, at least one 128-wide
block), chunked otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_FLASH_MIN_T = 128  # kernel MIN_BLOCK_SIZE — smaller T can't tile


def _largest_divisor_at_most(n: int, cap: int) -> int:
    c = min(cap, n)
    while n % c:
        c -= 1
    return c


def chunked_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 scale, q_chunk: int = 256) -> jnp.ndarray:
    """Exact-math SDPA scanned over query chunks; inputs ``[B, H, T, Dh]``.

    The checkpointed scan body keeps residual memory at one chunk's worth of
    logits: the backward pass recomputes each chunk's ``[chunk, S]`` fp32
    logits/softmax instead of storing them for all T rows at once.
    """
    b, h, t, d = q.shape
    chunk = _largest_divisor_at_most(t, q_chunk)
    n = t // chunk
    if n == 1:
        return _exact(q, k, v, scale)
    qs = q.reshape(b, h, n, chunk, d).transpose(2, 0, 1, 3, 4)

    @jax.checkpoint
    def body(carry, qb):
        return carry, _exact(qb, k, v, scale)

    _, out = jax.lax.scan(body, None, qs)
    return out.transpose(1, 2, 0, 3, 4).reshape(b, h, t, d)


def _exact(q, k, v, scale):
    """Reference-ordered math: scale q and k separately, fp32 softmax
    (openaimodel.py:388-391) — shared with models/attention.py's exact path.

    ``scale`` may be a python float (AttentionBlock passes one so the flash
    kernel gets a static ``sm_scale``); promoting it to an f32 scalar here
    keeps the historical bf16->f32 q/k promotion of the parity path."""
    scale = jnp.asarray(scale, jnp.float32)
    logits = jnp.einsum("bhtd,bhsd->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", weights, v)


@functools.lru_cache(maxsize=None)
def _flash_fns():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    return BlockSizes, flash_attention


def flash_ok(t: int, d: int) -> bool:
    """Whether [*, *, t, d] tiles onto the stock TPU flash kernel."""
    return t >= _FLASH_MIN_T and t % _FLASH_MIN_T == 0


def flash_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               scale, block: int = 512) -> jnp.ndarray:
    """Stock Pallas TPU flash attention; ``scale`` is the reference's
    per-operand ``1/sqrt(sqrt(dh))`` — folded to ``sm_scale = scale**2``."""
    BlockSizes, flash_attention = _flash_fns()
    t = q.shape[2]
    blk = _largest_divisor_at_most(t, block)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    return flash_attention(q, k, v, causal=False, sm_scale=float(scale) ** 2,
                           block_sizes=sizes)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale, *,
         impl: str = "exact", q_chunk: int = 256) -> jnp.ndarray:
    """Dispatch SDPA over ``[B, H, T, Dh]`` by implementation name.

    ``impl``: ``exact`` (full [T, S] logits — the parity default) |
    ``chunked`` | ``flash`` | ``auto`` (flash on TPU when the shape tiles,
    chunked otherwise; resolved at trace time).
    """
    if impl == "auto":
        impl = ("flash" if jax.default_backend() == "tpu"
                and flash_ok(q.shape[2], q.shape[3]) else "chunked")
    if impl == "exact":
        return _exact(q, k, v, scale)
    if impl == "chunked":
        return chunked_sdpa(q, k, v, scale, q_chunk=q_chunk)
    if impl == "flash":
        return flash_sdpa(q, k, v, scale)
    raise ValueError(f"unknown attn impl {impl!r}")
