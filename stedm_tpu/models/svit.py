"""Set-ViT (sViT) style encoder (reference `networks/vit_set.py`).

A ViT generalized to *sets* of images: the N set members are stacked channel-wise
before patch embedding (SPT, vit_set.py:84-107), attention uses a learnable
log-temperature with diagonal self-masking (LSA, vit_set.py:35-67), and a CLS token
plus an (optionally projected) time-embedding token are prepended before the
transformer. On the active path (s_zss_dm.py:55) it is called with only the style
set, so the time token is zeros — both paths are kept for completeness.

Shipped config (configs/style_agg/svit.yaml): patch 8, dim 256, depth 6, heads 12,
mlp_dim 256, mean pooling.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LSA(nn.Module):
    """Locality-aware self-attention: learnable exp(temperature) scale, the diagonal
    (token attending to itself) masked out (vit_set.py:35-67)."""

    heads: int = 12
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, d = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        temperature = self.param("temperature",
                                 nn.initializers.constant(math.log(self.dim_head ** -0.5)),
                                 ())
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) * jnp.exp(temperature)
        eye = jnp.eye(n, dtype=bool)
        logits = jnp.where(eye[None, None], jnp.finfo(jnp.float32).min, logits)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.dropout > 0:
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("bhts,bhsd->bhtd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(d, dtype=self.dtype, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class SViTFeedForward(nn.Module):
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.gelu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class SPT(nn.Module):
    """Set patch tokenizer: stack set members channel-wise, patchify, LN, project
    (vit_set.py:84-107)."""

    dim: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_set: jnp.ndarray) -> jnp.ndarray:
        """x_set: [B, N, H, W, C] -> tokens [B, (H/p)(W/p), dim]."""
        b, n, h, w, c = x_set.shape
        p = self.patch_size
        # stack the set channel-wise: [B, H, W, C*N]
        x = x_set.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)
        # patchify: matches torch Rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)')
        x = x.reshape(b, h // p, p, w // p, p, n * c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * n * c)
        x = nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name="patch_norm")(x).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)


class SViT(nn.Module):
    """Set-ViT (vit_set.py:110-208)."""

    image_size: int = 512
    patch_size: int = 8
    num_classes: int = 512
    dim: int = 256
    depth: int = 6
    heads: int = 12
    mlp_dim: int = 256
    pool: str = "mean"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    ns: int = 1
    t_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_set: jnp.ndarray, t_emb: jnp.ndarray | None = None,
                 c_old: jnp.ndarray | None = None, train: bool = False) -> jnp.ndarray:
        b = img_set.shape[0]
        num_patches = (self.image_size // self.patch_size) ** 2

        patches = SPT(dim=self.dim, patch_size=self.patch_size, dtype=self.dtype,
                      name="to_patch_embedding")(img_set)
        n = patches.shape[1]

        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches + 2, self.dim))
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        cls_tokens = jnp.broadcast_to(cls, (b, 1, self.dim)).astype(self.dtype)

        if t_emb is None:
            t_tok = jnp.zeros((b, 1, self.dim), dtype=self.dtype)
        else:
            t_tok = nn.Dense(self.dim, dtype=self.dtype,
                             name="to_time_embedding")(t_emb.astype(self.dtype))
            t_tok = t_tok.reshape(b, self.ns, -1)[:, :1]

        x = jnp.concatenate([cls_tokens, t_tok, patches], axis=1)
        x = x + pos[:, : n + 2].astype(self.dtype)
        if self.emb_dropout > 0:
            x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        for i in range(self.depth):
            h = nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name=f"block{i}_norm_attn")(x).astype(self.dtype)
            x = x + LSA(self.heads, self.dim_head, self.dropout, dtype=self.dtype,
                        name=f"block{i}_attn")(h, train=train)
            h = nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name=f"block{i}_norm_ff")(x).astype(self.dtype)
            x = x + SViTFeedForward(self.mlp_dim, self.dropout, dtype=self.dtype,
                                    name=f"block{i}_ff")(h, train=train)

        if self.pool == "mean":
            x = x.mean(axis=1)
        elif self.pool == "sum":
            x = x.sum(axis=1)
        elif self.pool == "cls":
            x = x[:, 0]
        if c_old is not None:
            x = x + c_old
        x = nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name="head_norm")(x).astype(self.dtype)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
