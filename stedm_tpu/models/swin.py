"""Swin Transformer V2 (Tiny) style encoder in Flax (NHWC).

The reference builds the style encoder as ``torchvision.models.get_model("swin_v2_t")``
with the classification head replaced by ``Linear(768, 512)`` and **random init**
(reference `networks/s_zss_dm.py:19-20`; SURVEY.md Q1). This is a from-scratch
implementation of the Swin-V2 architecture ("Swin Transformer V2: Scaling Up Capacity
and Resolution", Liu et al. 2022) at the Tiny configuration:

* patch 4, embed 96, depths (2,2,6,2), heads (3,6,24 -> 3,6,12,24), window 8,
* **post**-normalization residuals (LN after attention/MLP, then add),
* cosine attention with a learnable per-head log temperature clamped at log(100),
* log-spaced continuous relative position bias from a 2-layer MLP (CPB),
* PatchMergingV2 (linear 4C->2C, then LN).

TPU notes: window partitioning is pure reshape/transpose (static shapes), attention
runs over 64-token windows batched across (batch x windows) — a natural MXU shape —
and softmax is fp32.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _relative_coords_table(window: int) -> np.ndarray:
    """Log-spaced normalized relative coordinates, [(2W-1)^2, 2] (Swin-V2 CPB input)."""
    if window == 1:
        return np.zeros((1, 2), dtype=np.float32)
    coords = np.arange(-(window - 1), window, dtype=np.float64)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)  # (2W-1,2W-1,2)
    table = table / (window - 1) * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2).astype(np.float32)


def _relative_position_index(window: int) -> np.ndarray:
    """Map each (query, key) pair in a window to its CPB table row, [W^2, W^2]."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))                       # 2, W, W
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                            # 2, W^2, W^2
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Additive attention mask for wrapped shifted windows, [nW, T, T]."""
    img = np.zeros((1, h, w, 1), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    mw = img.reshape(1, h // win, win, w // win, win, 1).transpose(0, 1, 3, 2, 4, 5)
    mw = mw.reshape(-1, win * win)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttentionV2(nn.Module):
    """Cosine attention over local windows with continuous relative position bias.

    ``remat_core=True`` (default) rematerializes the logits->softmax->weighted
    -sum core under `jax.checkpoint`: the fp32 [B*win, heads, T, T] logits and
    softmax tensors — the largest training-memory temps in the whole flagship
    step, at 2.0x T(8,128) lane-padding expansion since T=64 (the batch-32 OOM
    dump names them; VERDICT r4 task 2a) — are recomputed in the backward pass
    instead of stored. Recompute cost is just the two 64-token matmuls plus a
    softmax (the qkv/proj Denses stay OUTSIDE the checkpoint), numerics are
    bit-identical, and inference is untouched (checkpoint is a no-op without
    grad)."""

    dim: int
    num_heads: int
    window: int
    dtype: Dtype = jnp.float32
    remat_core: bool = True

    @nn.compact
    def __call__(self, xw: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """xw: [B*, T, C] where T = window^2 tokens of one window; ``mask`` is a
        static [nW, T, T] additive mask for shifted windows."""
        bt, t, c = xw.shape
        heads = self.num_heads
        dh = c // heads

        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(bt, t, 3, heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # cosine attention: L2-normalize q/k, learnable log temperature per head.
        # rsqrt(|v|^2 + eps) instead of /(norm + eps): the norm's gradient is NaN at
        # v == 0 exactly, which constant (e.g. dropped-style) inputs produce
        def l2norm(v):
            sq = jnp.sum(jnp.square(v.astype(jnp.float32)), axis=-1, keepdims=True)
            return (v.astype(jnp.float32) * jax.lax.rsqrt(sq + 1e-12)).astype(v.dtype)

        q = l2norm(q)
        k = l2norm(k)
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(math.log(10.0)), (heads, 1, 1))
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))

        # continuous relative position bias (CPB MLP: 2 -> 512 -> heads)
        table = jnp.asarray(_relative_coords_table(self.window))
        h1 = nn.Dense(512, dtype=jnp.float32, name="cpb_mlp_0")(table)
        bias_table = nn.Dense(heads, use_bias=False, dtype=jnp.float32,
                              name="cpb_mlp_2")(nn.relu(h1))
        idx = jnp.asarray(_relative_position_index(self.window)).reshape(-1)
        bias = bias_table[idx].reshape(t, t, heads).transpose(2, 0, 1)
        bias = 16.0 * nn.sigmoid(bias)

        def attn_core(q, k, v, scale, bias):
            logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                                preferred_element_type=jnp.float32) * scale
            logits = logits + bias[None]
            if mask is not None:  # static [nW, T, T] numpy-derived constant
                n_windows = mask.shape[0]
                logits = logits.reshape(bt // n_windows, n_windows, heads, t, t)
                logits = logits + mask[None, :, None]
                logits = logits.reshape(bt, heads, t, t)
            weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            return jnp.einsum("bhts,bhsd->bhtd", weights, v)

        if self.remat_core:
            attn_core = jax.checkpoint(attn_core)
        out = attn_core(q, k, v, scale, bias)
        out = out.transpose(0, 2, 1, 3).reshape(bt, t, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(xw: jnp.ndarray, w: int, b: int, h: int, wd: int) -> jnp.ndarray:
    x = xw.reshape(b, h // w, wd // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, -1)


class SwinBlockV2(nn.Module):
    """Post-norm Swin-V2 block: x + LN(WinAttn(x)); x + LN(MLP(x))."""

    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    remat_attn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        win = min(self.window, h, w)
        # no shift when the feature map is a single window (torchvision clamps too)
        shift = self.shift if (h > win or w > win) and self.shift < win else 0

        shortcut = x
        mask = None
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, win, shift))
        xw = _window_partition(x, win)
        attn = WindowAttentionV2(self.dim, self.num_heads, win, dtype=self.dtype,
                                 remat_core=self.remat_attn,
                                 name="attn")(xw, mask)
        x = _window_reverse(attn, win, b, h, w)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)

        shortcut = x
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(x)
        # exact (erf) GELU for torchvision weight-import parity
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return shortcut + nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32, name="norm2")(y).astype(self.dtype)


class PatchMergingV2(nn.Module):
    """2x2 space-to-depth, linear 4C->2C, then LN (V2 ordering)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
        # torch cat order: [x0(0::2,0::2), x1(1::2,0::2), x2(0::2,1::2), x3(1::2,1::2)]
        # — after the (0,1,3,4,2,5) transpose dims 3,4 are (col-offset, row-offset),
        # so x1 (row-offset 1) is [..., 0, 1, :]; verified against a torch twin in
        # tests/test_swin_import.py
        x = x.reshape(b, h // 2, w // 2, 2, 2, c)
        x = jnp.concatenate([x[..., 0, 0, :], x[..., 0, 1, :],
                             x[..., 1, 0, :], x[..., 1, 1, :]], axis=-1)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32, name="norm")(x).astype(self.dtype)


class SwinV2(nn.Module):
    """Swin-V2 backbone + pooled feature head."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 8
    num_classes: int = 512
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    remat_attn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32, name="patch_norm")(x).astype(self.dtype)
        dim = self.embed_dim
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(depth):
                shift = 0 if i % 2 == 0 else self.window // 2
                x = SwinBlockV2(dim, heads, self.window, shift, self.mlp_ratio,
                                dtype=self.dtype, remat_attn=self.remat_attn,
                                name=f"stage{stage}_block{i}")(x)
            if stage != len(self.depths) - 1:
                x = PatchMergingV2(dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        x = x.mean(axis=(1, 2))  # global average pool
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


def swin_v2_tiny(num_classes: int = 512, dtype: Dtype = jnp.float32,
                 remat_attn: bool = True) -> SwinV2:
    """The reference's style backbone config (s_zss_dm.py:19-20)."""
    return SwinV2(num_classes=num_classes, dtype=dtype, remat_attn=remat_attn)
