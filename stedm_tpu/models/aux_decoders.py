"""Auxiliary decoder / rescaler modules from the CompVis codec library (NHWC).

TPU-native rebuilds of the tail of the reference's
`ldm/modules/diffusionmodules/model.py:571-835` — SimpleDecoder,
UpsampleDecoder, LatentRescaler, MergedRescaleEncoder, MergedRescaleDecoder,
Upsampler, Resize, FirstStagePostProcessor. All of them are **dead in the
reference** (nothing on the shipped STEDM path instantiates them; they belong
to CompVis latent-diffusion's super-resolution / latent-rescaling experiments)
but they complete the codec library surface, so a user porting configs that
target them finds working counterparts here.

Built from the same blocks as the active codec (`stedm_tpu/models/vq.py`):
`ResnetBlockVQ` / `AttnBlockVQ` / `UpsampleVQ` with fp32 GroupNorm statistics
and NHWC layout. Flax module names are chosen so the torch key mapping stays
mechanical (`stedm_tpu/utils/torch_import.py: map_simple_decoder`,
`map_upsample_decoder`, `map_latent_rescaler`, `map_merged_rescale_encoder`,
`map_merged_rescale_decoder`, `map_first_stage_post`); forward parity against
the reference torch modules is tested in `tests/test_aux_decoders.py`.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from stedm_tpu.models.layers import GNSiLU
from stedm_tpu.models.vq import (AttnBlockVQ, ResnetBlockVQ, UpsampleVQ,
                                 VQDecoder, VQEncoder, _conv3)

Dtype = Any


def _nearest_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch `F.interpolate(mode='nearest')` semantics on NHWC: source index =
    floor(dst * in/out) (asymmetric legacy-nearest, NOT half-pixel centers —
    `jax.image.resize('nearest')` differs by one pixel at non-integer factors,
    so index explicitly; reference model.py:684 uses the torch default)."""
    h, w = x.shape[1], x.shape[2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int32)
    cols = (np.arange(out_w) * w // out_w).astype(np.int32)
    return x[:, rows][:, :, cols]


class SimpleDecoder(nn.Module):
    """1x1 conv -> ResnetBlocks 2x/4x/2x -> 1x1 conv -> 2x upsample -> out conv
    (reference model.py:571-604)."""

    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.in_channels
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="model_0")(
            x.astype(self.dtype))
        x = ResnetBlockVQ(2 * c, dtype=self.dtype, name="model_1")(x, train)
        x = ResnetBlockVQ(4 * c, dtype=self.dtype, name="model_2")(x, train)
        x = ResnetBlockVQ(2 * c, dtype=self.dtype, name="model_3")(x, train)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="model_4")(x)
        x = UpsampleVQ(dtype=self.dtype, name="model_5")(x)
        h = GNSiLU(epsilon=1e-6, dtype=self.dtype, name="norm_out")(x)
        return _conv3(self.out_channels, dtype=self.dtype, name="conv_out")(h)


class UpsampleDecoder(nn.Module):
    """Per-level (num_res_blocks+1) ResnetBlocks with 2x upsample between levels
    (reference model.py:607-652)."""

    in_channels: int
    out_channels: int
    ch: int
    num_res_blocks: int
    resolution: int          # kept for config parity; shapes are data-driven
    ch_mult: Sequence[int] = (2, 2)
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = x.astype(self.dtype)
        n_levels = len(self.ch_mult)
        for i_level in range(n_levels):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlockVQ(self.ch * self.ch_mult[i_level], self.dropout,
                                  dtype=self.dtype,
                                  name=f"res_{i_level}_{i_block}")(h, train)
            if i_level != n_levels - 1:
                h = UpsampleVQ(dtype=self.dtype,
                               name=f"upsample_{i_level}")(h)
        h = GNSiLU(epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        return _conv3(self.out_channels, dtype=self.dtype, name="conv_out")(h)


class LatentRescaler(nn.Module):
    """conv_in -> depth ResnetBlocks -> nearest-resize by ``factor`` -> attn ->
    depth ResnetBlocks -> 1x1 conv_out (reference model.py:655-689)."""

    factor: float
    in_channels: int
    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _conv3(self.mid_channels, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype))
        for i in range(self.depth):
            x = ResnetBlockVQ(dtype=self.dtype, name=f"res1_{i}")(x, train)
        out_h = int(round(x.shape[1] * self.factor))
        out_w = int(round(x.shape[2] * self.factor))
        x = _nearest_resize(x, out_h, out_w)
        x = AttnBlockVQ(dtype=self.dtype, name="attn")(x)
        for i in range(self.depth):
            x = ResnetBlockVQ(dtype=self.dtype, name=f"res2_{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="conv_out")(x)


class MergedRescaleEncoder(nn.Module):
    """Full codec Encoder followed by a LatentRescaler
    (reference model.py:692-708)."""

    in_channels: int
    ch: int
    resolution: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        intermediate = self.ch * self.ch_mult[-1]
        h = VQEncoder(ch=self.ch, ch_mult=tuple(self.ch_mult),
                      num_res_blocks=self.num_res_blocks,
                      attn_resolutions=tuple(self.attn_resolutions),
                      resolution=self.resolution, z_channels=intermediate,
                      double_z=False, dropout=self.dropout, dtype=self.dtype,
                      name="encoder")(x, train)
        return LatentRescaler(self.rescale_factor, intermediate, intermediate,
                              self.out_ch, self.rescale_module_depth,
                              dtype=self.dtype, name="rescaler")(h, train)


class MergedRescaleDecoder(nn.Module):
    """LatentRescaler followed by a full codec Decoder
    (reference model.py:711-725)."""

    z_channels: int
    out_ch: int
    resolution: int
    num_res_blocks: int
    attn_resolutions: Sequence[int] = ()
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    dropout: float = 0.0
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        tmp_chn = self.z_channels * self.ch_mult[-1]
        h = LatentRescaler(self.rescale_factor, self.z_channels, tmp_chn,
                           tmp_chn, self.rescale_module_depth,
                           dtype=self.dtype, name="rescaler")(x, train)
        return VQDecoder(ch=self.ch, out_ch=self.out_ch,
                         ch_mult=tuple(self.ch_mult),
                         num_res_blocks=self.num_res_blocks,
                         attn_resolutions=tuple(self.attn_resolutions),
                         resolution=self.resolution, z_channels=tmp_chn,
                         dropout=self.dropout, dtype=self.dtype,
                         name="decoder")(h, train)


class Upsampler(nn.Module):
    """LatentRescaler + Decoder sized by log2(out/in)
    (reference model.py:728-744)."""

    in_size: int
    out_size: int
    in_channels: int
    out_channels: int
    ch_mult: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.out_size >= self.in_size
        num_blocks = int(np.log2(self.out_size // self.in_size)) + 1
        factor_up = 1.0 + (self.out_size % self.in_size)
        h = LatentRescaler(factor_up, self.in_channels, 2 * self.in_channels,
                           self.in_channels, dtype=self.dtype,
                           name="rescaler")(x, train)
        return VQDecoder(ch=self.in_channels, out_ch=self.out_channels,
                         ch_mult=tuple(self.ch_mult for _ in range(num_blocks)),
                         num_res_blocks=2, attn_resolutions=(),
                         resolution=self.out_size, z_channels=self.in_channels,
                         dtype=self.dtype, name="decoder")(h, train)


def resize(x: jnp.ndarray, scale_factor: float = 1.0,
           mode: str = "bilinear") -> jnp.ndarray:
    """The reference's `Resize` module (model.py:747-768) — parameter-free
    interpolation (its ``learned`` branch raises NotImplementedError in the
    reference too). torch `align_corners=False` bilinear == jax's half-pixel
    'linear'; output size floors like `F.interpolate(scale_factor=...)`."""
    if scale_factor == 1.0:
        return x
    b, h, w, c = x.shape
    out_h, out_w = int(h * scale_factor), int(w * scale_factor)
    if mode == "nearest":
        return _nearest_resize(x, out_h, out_w)
    method = {"bilinear": "linear", "bicubic": "cubic"}.get(mode, mode)
    # torch F.interpolate does NOT antialias on downscale; jax defaults to
    # antialiasing — disable for parity
    return jax.image.resize(x, (b, out_h, out_w, c), method=method,
                            antialias=False)


class FirstStagePostProcessor(nn.Module):
    """Projects a frozen first-stage encoding and downsamples it through
    ResnetBlocks (reference model.py:770-834).

    Functional split: the reference embeds the frozen pretrained codec and
    calls it under `torch.no_grad` (`encode_with_pretrained`, model.py:815-820);
    here the caller passes either the pre-encoded latent directly or an
    ``encode_fn`` (applied under `stop_gradient` — same no-grad semantics, and
    for a KL first stage the caller passes the distribution **mode**, matching
    `DiagonalGaussianDistribution.mode()` there). Note the reference class is
    broken as shipped: model.py:818 references DiagonalGaussianDistribution
    without importing it, so its `encode_with_pretrained` would NameError at
    runtime — further evidence the module is dead code there."""

    ch_mult: Sequence[int]
    in_channels: int
    n_channels: int
    do_reshape: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 encode_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
                 train: bool = False) -> jnp.ndarray:
        z_fs = x if encode_fn is None else jax.lax.stop_gradient(encode_fn(x))
        z = GNSiLU(num_groups=self.in_channels // 2, epsilon=1e-6,
                   dtype=self.dtype, apply_silu=False, name="proj_norm")(
            z_fs.astype(self.dtype))
        z = _conv3(self.n_channels, dtype=self.dtype, name="proj")(z)
        z = jax.nn.silu(z)
        ch_in = self.n_channels
        for i, m in enumerate(self.ch_mult):
            ch_in = m * self.n_channels
            z = ResnetBlockVQ(ch_in, self.dropout, dtype=self.dtype,
                              name=f"model_{i}")(z, train)
            # Downsample(with_conv=False) = 2x2/2 average pool (model.py:74-78)
            z = nn.avg_pool(z, (2, 2), strides=(2, 2))
        if self.do_reshape:
            b, h, w, c = z.shape
            z = z.reshape(b, h * w, c)
        return z
