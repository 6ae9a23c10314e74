"""Attention blocks for the denoising U-Net.

`AttentionBlock` is the active bottleneck self-attention (reference
`ldm/modules/diffusionmodules/openaimodel.py:300-346` with `QKVAttentionLegacy`,
openaimodel.py:369-394). `SpatialTransformer` is the config-selectable
cross-attention path (reference `ldm/modules/attention.py:152-261`) which is
*unreachable* in the reference's shipped configs (SURVEY.md Q2) but implemented here
behind `use_spatial_transformer` for completeness.

All tensors are NHWC; softmax always runs in float32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from stedm_tpu.models.layers import GNSiLU

Dtype = Any


def _sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """softmax((q*s)(k*s)^T) v with fp32 softmax; inputs [B, H, T, Dh]."""
    dtype = q.dtype
    logits = jnp.einsum("bhtd,bhsd->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhts,bhsd->bhtd", weights, v)


class AttentionBlock(nn.Module):
    """Legacy-layout QKV self-attention over flattened spatial positions.

    The qkv projection's output channels are ordered head-major with (q, k, v)
    interleaved per head — [h0:q|k|v, h1:q|k|v, ...] — matching the reference's
    ``reshape(bs*heads, 3*dh, T).split(dh)`` (openaimodel.py:378-394), which a torch
    checkpoint importer must preserve. Scale is ``1/sqrt(sqrt(dh))`` applied to both
    q and k (openaimodel.py:388).

    ``attn_impl`` selects the SDPA realization (ops/blocked_attention.py):
    ``exact`` keeps the reference's full [T, T] logits; ``chunked``/``flash``/
    ``auto`` bound the attention working set for large T (the 512^2 batch-32
    OOM lever) without touching the qkv/proj parameter layout.
    """

    num_heads: int = 8
    dtype: Dtype = jnp.float32
    attn_impl: str = "exact"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from stedm_tpu.ops.blocked_attention import sdpa as blocked_sdpa

        b, h, w, c = x.shape
        heads = self.num_heads
        dh = c // heads
        xs = GNSiLU(dtype=self.dtype, apply_silu=False, name="norm")(x)
        xs = xs.reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xs)
        qkv = qkv.reshape(b, h * w, heads, 3, dh).transpose(0, 2, 3, 1, 4)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # python-float scale (CrossAttention precedent): the flash kernel needs
        # a static sm_scale; _exact re-promotes it to an f32 scalar so the
        # parity path's bf16->f32 q/k promotion semantics are unchanged.
        out = blocked_sdpa(q, k, v, float(dh) ** -0.25, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out",
                       kernel_init=nn.initializers.zeros_init())(out)
        return x + out.reshape(b, h, w, c)


class CrossAttention(nn.Module):
    """Multi-head attention with optional external context
    (reference ldm/modules/attention.py:152-193)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        split = lambda a: a.reshape(*a.shape[:2], self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = _sdpa(split(q), split(k), split(v),
                    scale=float(self.dim_head) ** -0.25)
        out = out.transpose(0, 2, 1, 3).reshape(*x.shape[:2], inner)
        out = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xg = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * nn.gelu(gate)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, each pre-LayerNormed + residual
    (reference attention.py:196-215)."""

    heads: int
    dim_head: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        attn = lambda name: CrossAttention(heads=self.heads, dim_head=self.dim_head,
                                           dropout=self.dropout, dtype=self.dtype, name=name)
        ln = lambda name: nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name=name)
        x = attn("attn1")(ln("norm1")(x).astype(self.dtype), train=train) + x
        x = attn("attn2")(ln("norm2")(x).astype(self.dtype), context, train=train) + x
        dim = x.shape[-1]
        h = GEGLU(dim * 4, dtype=self.dtype, name="ff_geglu")(ln("norm3")(x).astype(self.dtype))
        h = nn.Dense(dim, dtype=self.dtype, name="ff_out")(h)
        return h + x


class SpatialTransformer(nn.Module):
    """Transformer over spatial tokens with 1x1-conv in/out projections
    (reference attention.py:218-261). 1-D context vectors are lifted to a single
    cross-attention token."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        if context is not None and context.ndim == 2:
            context = context[:, None, :]
        res = x
        x = GNSiLU(dtype=self.dtype, apply_silu=False, name="norm")(x)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x).reshape(b, h * w, inner)
        for d in range(self.depth):
            x = BasicTransformerBlock(heads=self.heads, dim_head=self.dim_head,
                                      dropout=self.dropout, dtype=self.dtype,
                                      name=f"block_{d}")(x, context, train=train)
        x = x.reshape(b, h, w, inner)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out",
                     kernel_init=nn.initializers.zeros_init())(x)
        return x + res
