"""Segmentation network: SegFormer MiT-B2 encoder + U-Net decoder (NHWC).

The reference uses ``smp.Unet(encoder_name="mit_b2", encoder_weights="imagenet",
classes=2)`` (reference `modules/segmentation.py:41`). This is a from-scratch
implementation of the same composite: the Mix-Transformer B2 encoder ("SegFormer:
Simple and Efficient Design for Semantic Segmentation with Transformers", Xie et al.
2021 — overlapping patch embeds, efficient attention with spatial-reduction, MixFFN
with a depthwise conv) feeding a U-Net decoder with skip connections.

MiT-B2: embed dims (64, 128, 320, 512), depths (3, 4, 6, 3), heads (1, 2, 5, 8),
spatial-reduction ratios (8, 4, 2, 1), strides (4, 8, 16, 32). Pretrained ImageNet
weights need egress; ``encoder_ckpt`` can point at an imported checkpoint, else the
encoder trains from random init.

TPU notes: attention over (H/4)^2 tokens at stage 1 is tamed by the spatial
reduction (keys/values pooled 8x), all LayerNorms fp32, softmax fp32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class EfficientAttention(nn.Module):
    """Self-attention with spatial reduction of K/V (SegFormer eq. 2)."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        heads = self.num_heads
        dh = c // heads
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)

        kv_in = x
        if self.sr_ratio > 1:
            xs = x.reshape(b, h, w, c)
            xs = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio), dtype=self.dtype,
                         name="sr")(xs)
            kv_in = nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name="sr_norm")(
                xs.reshape(b, -1, c)).astype(self.dtype)
        k = nn.Dense(c, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(c, dtype=self.dtype, name="v")(kv_in)

        split = lambda a: a.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) * (dh ** -0.5)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """fc1 -> 3x3 depthwise conv -> GELU -> fc2 (SegFormer eq. 3)."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        ys = y.reshape(b, h, w, self.hidden)
        ys = nn.Conv(self.hidden, (3, 3), feature_group_count=self.hidden,
                     dtype=self.dtype, name="dwconv")(ys)
        # exact (erf) GELU: the published MiT uses torch nn.GELU(), and the
        # imagenet-weight importer (utils/torch_import.map_mit_b2) relies on
        # activation parity
        y = nn.gelu(ys.reshape(b, n, self.hidden), approximate=False)
        return nn.Dense(c, dtype=self.dtype, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name=name)
        x = x + EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                                   dtype=self.dtype, name="attn")(
            ln("norm1")(x).astype(self.dtype), h, w)
        x = x + MixFFN(self.dim * self.mlp_ratio, dtype=self.dtype, name="ffn")(
            ln("norm2")(x).astype(self.dtype), h, w)
        return x


class MiTEncoder(nn.Module):
    """Mix-Transformer encoder; returns the 4 stage feature maps (strides 4..32)."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        for stage, (dim, depth, heads, sr) in enumerate(
                zip(self.embed_dims, self.depths, self.num_heads, self.sr_ratios)):
            if stage == 0:
                x = nn.Conv(dim, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
                            dtype=self.dtype, name="patch_embed_0")(x)
            else:
                x = nn.Conv(dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"patch_embed_{stage}")(x)
            b, h, w, c = x.shape
            t = nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name=f"embed_norm_{stage}")(
                x.reshape(b, h * w, c)).astype(self.dtype)
            for i in range(depth):
                t = MiTBlock(dim, heads, sr, dtype=self.dtype,
                             name=f"stage{stage}_block{i}")(t, h, w)
            t = nn.LayerNorm(use_fast_variance=False, dtype=jnp.float32, name=f"stage_norm_{stage}")(t)
            x = t.reshape(b, h, w, c).astype(self.dtype)
            feats.append(x)
        return feats


class DecoderBlock(nn.Module):
    """Upsample 2x, concat skip, two conv-BN-ReLU (smp UnetDecoder block)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None,
                 train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        for i in (1, 2):
            x = nn.Conv(self.out_channels, (3, 3), use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                             name=f"bn{i}")(x).astype(self.dtype)
            x = nn.relu(x)
        return x


class SegUNet(nn.Module):
    """MiT-B2 encoder + U-Net decoder -> per-pixel class logits at input res."""

    classes: int = 2
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.float32
    # MiTEncoder overrides (embed_dims/depths/num_heads/sr_ratios) for tiny
    # test/dryrun variants; None keeps the reference's MiT-B2 sizing
    # (reference modules/segmentation.py:39-42)
    encoder_config: dict | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_dtype = x.dtype
        feats = MiTEncoder(dtype=self.dtype, name="encoder",
                           **(self.encoder_config or {}))(x.astype(self.dtype))
        # feats strides: 4, 8, 16, 32 -> decode back up to stride 1
        h = feats[-1]
        skips = [feats[2], feats[1], feats[0], None, None]
        for i, (skip, ch) in enumerate(zip(skips, self.decoder_channels)):
            h = DecoderBlock(ch, dtype=self.dtype, name=f"decoder_{i}")(h, skip, train)
        logits = nn.Conv(self.classes, (3, 3), dtype=self.dtype,
                         name="seg_head")(h)
        return logits.astype(jnp.float32 if in_dtype == jnp.float32 else in_dtype)
