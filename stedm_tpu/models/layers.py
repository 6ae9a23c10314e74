"""Shared NN building blocks (NHWC, mixed precision).

Precision policy: parameters live in float32; compute runs in ``dtype`` (bfloat16 on
TPU); GroupNorm statistics are always computed in float32, mirroring the reference's
``GroupNorm32`` (reference `ldm/modules/diffusionmodules/util.py:214-216`).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, cos-first ordering
    (reference diffusionmodules/util.py:151-171)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class GroupNorm32(nn.Module):
    """32-group GroupNorm with float32 statistics regardless of compute dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                         dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        return y.astype(self.dtype)


class _NormParams(nn.Module):
    """GroupNorm affine parameters only — same names/shapes as
    ``flax.linen.GroupNorm`` so the tree path (and the torch importer's key map)
    is identical whether the fused or the plain path runs."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class GNSiLU(nn.Module):
    """GroupNorm(+embedding-add | +FiLM)(+SiLU) through the fused one-pass TPU
    kernel (`stedm_tpu.ops.gn_silu`); float32 statistics, flax GroupNorm
    numerics, jnp fallback elsewhere. Parameters live under ``<name>/norm`` like
    the `GroupNorm32`-wrapped `nn.GroupNorm` it replaces."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    apply_silu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, add: jnp.ndarray | None = None,
                 film_scale: jnp.ndarray | None = None,
                 film_shift: jnp.ndarray | None = None) -> jnp.ndarray:
        import os

        from stedm_tpu.ops.gn_silu import gn_silu

        if os.environ.get("STEDM_GN_FLAX", "") not in ("", "0", "false",
                                                       "False"):
            # A/B reference: the original nn.GroupNorm composite (identical
            # params/semantics; add in compute dtype, stats fp32)
            if add is not None:
                x = x + add[:, None, None, :].astype(x.dtype)
            y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                             dtype=jnp.float32, name="norm")(
                x.astype(jnp.float32))
            if film_scale is not None:
                y = y * (1 + film_scale[:, None, None, :]) \
                    + film_shift[:, None, None, :]
            if self.apply_silu:
                y = jax.nn.silu(y)
            return y.astype(self.dtype)

        scale, bias = _NormParams(x.shape[-1], name="norm")()
        y = gn_silu(x, scale, bias, add=add, film_scale=film_scale,
                    film_shift=film_shift, groups=self.num_groups,
                    eps=self.epsilon, apply_silu=self.apply_silu)
        return y.astype(self.dtype)


def conv3x3(features: int, *, name: str | None = None, zero_init: bool = False,
            stride: int = 1, dtype: Dtype = jnp.float32) -> nn.Conv:
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(features, kernel_size=(3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), kernel_init=init, dtype=dtype, name=name)


def conv1x1(features: int, *, name: str | None = None, zero_init: bool = False,
            use_bias: bool = True, dtype: Dtype = jnp.float32) -> nn.Conv:
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(features, kernel_size=(1, 1), kernel_init=init, use_bias=use_bias,
                   dtype=dtype, name=name)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    # broadcast+reshape tiling: bit-identical to nearest resize at integer
    # scale, but lowers to a cheap broadcast instead of a gather
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class Upsample(nn.Module):
    """Nearest 2x upsample + optional 3x3 conv (reference openaimodel.py:104-132)."""

    use_conv: bool = True
    out_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest_2x(x)
        if self.use_conv:
            x = conv3x3(self.out_channels or x.shape[-1], dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv (or 2x2 avgpool) downsample (reference openaimodel.py:147-173)."""

    use_conv: bool = True
    out_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return conv3x3(self.out_channels or x.shape[-1], stride=2,
                           dtype=self.dtype, name="op")(x)
        assert self.out_channels in (None, x.shape[-1])
        return nn.avg_pool(x, (2, 2), strides=(2, 2))
