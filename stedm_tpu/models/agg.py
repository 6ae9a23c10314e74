"""Style-set aggregation blocks (reference `networks/agg_blocks.py`).

Each block embeds every image of the [B, N, H, W, C] style set through a shared
backbone and aggregates the N per-image 512-d features into one style vector.
The set axis is folded into the batch axis for the backbone call — on TPU this turns
N small forwards into one large batched forward.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class AggLinear(nn.Module):
    """Concat N features -> ReLU-MLP to 512 (reference agg_blocks.py:6-33)."""

    embedder: nn.Module
    num_patches: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, style_imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, h, w, c = style_imgs.shape
        feats = self.embedder(style_imgs.reshape(b * n, h, w, c), train=train)
        feats = feats.reshape(b, n * feats.shape[-1])
        x = nn.relu(feats)
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="linear_0")(x))
        return nn.relu(nn.Dense(512, dtype=self.dtype, name="linear_1")(x))


class AggMax(nn.Module):
    """Elementwise max over the set (reference agg_blocks.py:36-54)."""

    embedder: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, style_imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, h, w, c = style_imgs.shape
        feats = self.embedder(style_imgs.reshape(b * n, h, w, c), train=train)
        return feats.reshape(b, n, -1).max(axis=1)


class AggMean(nn.Module):
    """Mean over the set (reference agg_blocks.py:57-75)."""

    embedder: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, style_imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, h, w, c = style_imgs.shape
        feats = self.embedder(style_imgs.reshape(b * n, h, w, c), train=train)
        return feats.reshape(b, n, -1).mean(axis=1)


class AggNone(nn.Module):
    """Unconditional: a zero style vector (reference agg_blocks.py:78-86)."""

    features: int = 512

    @nn.compact
    def __call__(self, style_imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return jnp.zeros((style_imgs.shape[0], self.features), dtype=jnp.float32)
