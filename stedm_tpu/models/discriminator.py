"""PatchGAN discriminator for VAE/VQGAN adversarial training, NHWC.

TPU-native rebuild of ``taming.modules.discriminator.model.NLayerDiscriminator``
(the pix2pix PatchGAN), which the reference's VAE losses instantiate
(reference ldm/modules/losses/vqperceptual.py:6, contperceptual via
``from taming... import *``). Dead on the reference's shipped path
(``lossconfig: torch.nn.Identity``) but required for codec fine-tuning.

Module names mirror the torch ``main.{idx}`` sequential indices
(``main_{idx}``) so checkpoint import is mechanical
(`stedm_tpu.utils.torch_import.map_discriminator`). BatchNorm follows torch
semantics (eps 1e-5, momentum 0.1 -> flax momentum 0.9; convs feeding a
BatchNorm carry no bias). ``weights_init`` (N(0, 0.02) convs, N(1, 0.02)
BatchNorm scale) is reproduced by the custom initializers so a fresh Flax init
is distributionally identical to the reference's.

ActNorm divergence note: taming's ActNorm does a data-dependent init on the
first forward batch (mean/std of that batch). Data-dependent init is hostile
to jit (a traced conditional on python state), so ours initializes loc=0,
scale=1 — identical once a checkpoint is loaded, different only for the first
few fresh-training steps with ``use_actnorm=true``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import random

Dtype = Any


def _disc_conv_init(key, shape, dtype=jnp.float32):
    """taming ``weights_init``: Conv weights ~ N(0.0, 0.02)."""
    return random.normal(key, shape, dtype) * 0.02


def _bn_scale_init(key, shape, dtype=jnp.float32):
    """taming ``weights_init``: BatchNorm weight ~ N(1.0, 0.02)."""
    return 1.0 + random.normal(key, shape, dtype) * 0.02


class ActNorm(nn.Module):
    """Per-channel affine norm (taming ActNorm, logdet-free path)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        return (x + loc.astype(x.dtype)) * scale.astype(x.dtype)


class NLayerDiscriminator(nn.Module):
    """[B, H, W, input_nc] -> [B, H', W', 1] patch logits."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: Dtype = jnp.float32

    def _norm(self, name: str):
        if self.use_actnorm:
            return ActNorm(dtype=self.dtype, name=name)
        return nn.BatchNorm(use_running_average=None, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            scale_init=_bn_scale_init, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # convs feeding a BatchNorm have no bias (torch use_bias rule)
        use_bias = self.use_actnorm

        def conv(h, ch, idx, stride, bias=True):
            return nn.Conv(ch, (4, 4), strides=(stride, stride),
                           padding=((1, 1), (1, 1)), use_bias=bias,
                           kernel_init=_disc_conv_init, dtype=self.dtype,
                           name=f"main_{idx}")(h)

        x = x.astype(self.dtype)
        h = nn.leaky_relu(conv(x, self.ndf, 0, 2), 0.2)
        idx, mult = 1, 1
        for n in range(1, self.n_layers + 1):
            stride = 2 if n < self.n_layers else 1
            mult = min(2 ** n, 8)
            h = conv(h, self.ndf * mult, idx + 1, stride, bias=use_bias)
            norm = self._norm(f"main_{idx + 2}")
            h = norm(h) if self.use_actnorm else norm(
                h, use_running_average=not train)
            h = nn.leaky_relu(h, 0.2)
            idx += 3
        return conv(h, 1, idx + 1, 1).astype(jnp.float32)
