"""Layout-conditioning encoder.

`SpatialRescaler` (reference `ldm/modules/encoders/modules.py:104-134`): n_stages of
0.5x bilinear downsampling followed by an optional bias-free 1x1 channel mapper. The
shipped config (configs/diffusion/cond_stage_config/spatial.yaml) takes the 512^2
2-channel one-hot layout to the 128^2 3-channel latent grid. This is the *trainable*
cond stage (6 weights) of the diffusion model.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class SpatialRescaler(nn.Module):
    n_stages: int = 2
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 2
    out_channels: int | None = 3
    bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        method = {"bilinear": "linear", "nearest": "nearest", "bicubic": "cubic"}.get(
            self.method, self.method)
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            if method == "linear" and self.multiplier == 0.5:
                # torch bilinear 0.5x (align_corners=False, antialias=False) samples
                # exactly between pixel pairs == 2x2 average pooling; jax.image.resize
                # would antialias and diverge from the reference
                x = nn.avg_pool(x.astype(jnp.float32), (2, 2), strides=(2, 2))
            else:
                new = (b, int(h * self.multiplier), int(w * self.multiplier), c)
                x = jax.image.resize(x.astype(jnp.float32), new, method=method)
        x = x.astype(self.dtype)
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=self.bias,
                        dtype=self.dtype, name="channel_mapper")(x)
        return x

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x)
