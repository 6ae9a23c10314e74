"""KL-regularized autoencoder and identity first stage.

Counterparts of the reference's `AutoencoderKL` and `IdentityFirstStage`
(reference `ldm/models/autoencoder.py:285-443`) plus `DiagonalGaussianDistribution`
(`ldm/modules/distributions/distributions.py:24-62`). Not used by the shipped
configs (the active codec is VQ-f4, SURVEY.md Q3) but part of the first-stage
surface: select via ``first_stage_config.target``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from stedm_tpu.models.vq import VQDecoder, VQEncoder

Dtype = Any


class DiagonalGaussian:
    """Moments container over a [.., 2*z] channel split (reference
    distributions.py:24-62)."""

    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters.astype(jnp.float32), 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(())
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0 - self.logvar,
                                 axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var + self.var / other.var
            - 1.0 - self.logvar + other.logvar, axis=axes)

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        import math

        if self.deterministic:
            return jnp.zeros(())
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            math.log(2.0 * math.pi) + self.logvar
            + (sample - self.mean) ** 2 / self.var, axis=axes)


class AutoencoderKL(nn.Module):
    """(reference autoencoder.py:285-423). ``encode`` returns the moment tensor;
    callers sample/mode via :class:`DiagonalGaussian` (the LDM train path uses
    ``sample``, `get_first_stage_encoding`, reference ddpm.py:545-552)."""

    embed_dim: int = 4
    ddconfig: dict | None = None
    dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig or {})
        enc_keys = ("ch", "ch_mult", "num_res_blocks", "attn_resolutions",
                    "resolution", "z_channels", "dropout")
        enc_args = {k: dd[k] for k in enc_keys if k in dd}
        self.encoder = VQEncoder(double_z=True, dtype=self.dtype, **enc_args)
        dec_args = dict(enc_args)
        if "out_ch" in dd:
            dec_args["out_ch"] = dd["out_ch"]
        self.decoder = VQDecoder(dtype=self.dtype, **dec_args)
        z_ch = dd.get("z_channels", 4)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(z_ch, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Image -> [.., 2*embed_dim] Gaussian moments."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jnp.ndarray, force_not_quantize: bool = False) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array | None = None) -> jnp.ndarray:
        moments = self.encode(x)
        dist = DiagonalGaussian(moments, deterministic=rng is None)
        z = dist.mode() if rng is None else dist.sample(rng)
        return self.decode(z)

    def training_recon(self, x: jnp.ndarray, rng: jax.Array):
        """KL training forward (the reference's ``AutoencoderKL.forward`` with
        ``sample_posterior=True``, autoencoder.py:335-342): returns
        ``(reconstruction, posterior)`` for `stedm_tpu.train.vae_losses.
        kl_generator_loss`. Used only by codec training (train_ae.py)."""
        posterior = DiagonalGaussian(self.encode(x))
        return self.decode(posterior.sample(rng)), posterior


class IdentityFirstStage(nn.Module):
    """(reference autoencoder.py:426-443)"""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return x

    def decode(self, x: jnp.ndarray, force_not_quantize: bool = False) -> jnp.ndarray:
        return x
