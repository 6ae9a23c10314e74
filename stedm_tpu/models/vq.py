"""VQGAN-f4 first-stage codec in Flax (NHWC).

Mirrors the reference's CompVis encoder/decoder (reference
`ldm/modules/diffusionmodules/model.py:368-568`) and the taming `VectorQuantizer2`
semantics used by `VQModelInterface` (reference `ldm/models/autoencoder.py:264-282`):
``encode`` returns **pre-quantization** latents; ``decode`` quantizes, then decodes.

The codec is frozen on the diffusion path (reference ddpm.py:505-510), so encode and
decode are pure jitted functions here — and unlike the reference's per-sample python
loop (ddpm.py:864-866, SURVEY.md Q5), encoding is a single batched call.

The shipped vq-f4 config (configs/diffusion/first_stage_config/vq-f4.yaml):
ch 128, ch_mult [1,2,4] (f=4), 2 res blocks, no down-path attention, mid-block
attention at the bottleneck, 8192x3 codebook.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stedm_tpu.models.layers import GNSiLU

Dtype = Any


class GroupNormVQ(nn.Module):
    """32-group GroupNorm, eps 1e-6 (reference model.py:37-39), fp32 statistics."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        return y.astype(self.dtype)


def _conv3(features: int, *, stride: int = 1, name: str | None = None,
           padding="SAME", dtype: Dtype = jnp.float32) -> nn.Conv:
    return nn.Conv(features, kernel_size=(3, 3), strides=(stride, stride),
                   padding=padding, dtype=dtype, name=name)


class ResnetBlockVQ(nn.Module):
    """GN-swish-conv x2 with 1x1 nin shortcut (reference model.py:82-143)."""

    out_channels: int | None = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.out_channels or x.shape[-1]
        h = GNSiLU(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = _conv3(out_ch, dtype=self.dtype, name="conv1")(h)
        h = GNSiLU(epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _conv3(out_ch, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlockVQ(nn.Module):
    """Single-head spatial self-attention (reference model.py:150-202).

    At generation resolutions the token count is large (4096 at 256^2 decode,
    16384 at 512^2) and the naive T^2 logits matrix costs up to ~1GB of HBM per
    image; on TPU with >= 2048 tokens this dispatches to the Pallas flash-attention
    kernel (streaming softmax, no materialized logits)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        t = h * w
        hn = GNSiLU(epsilon=1e-6, dtype=self.dtype, apply_silu=False,
                    name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, t, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, t, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, t, c)

        use_flash = (jax.default_backend() in ("tpu", "axon") and t >= 2048
                     and t % 512 == 0 and c % 128 == 0)
        if use_flash:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa

            out = fa.flash_attention(q[:, None], k[:, None], v[:, None],
                                     sm_scale=float(c) ** -0.5)[:, 0]
        else:
            logits = jnp.einsum("btc,bsc->bts", q, k,
                                preferred_element_type=jnp.float32) * (c ** -0.5)
            weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bts,bsc->btc", weights, v)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(
            out.reshape(b, h, w, c))
        return x + out


class DownsampleVQ(nn.Module):
    """Asymmetric-pad stride-2 conv (reference model.py:60-78: pad (0,1,0,1))."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv3(x.shape[-1], stride=2, padding="VALID", dtype=self.dtype,
                      name="conv")(x)


class UpsampleVQ(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv3(c, dtype=self.dtype, name="conv")(x)


class VQEncoder(nn.Module):
    """(reference model.py:368-459)"""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 512
    z_channels: int = 3
    double_z: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h = _conv3(self.ch, dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlockVQ(self.ch * mult, self.dropout, dtype=self.dtype,
                                  name=f"down_{i_level}_block_{i_block}")(h, train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlockVQ(dtype=self.dtype,
                                    name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = DownsampleVQ(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlockVQ(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(h, train)
        h = AttnBlockVQ(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlockVQ(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(h, train)
        h = GNSiLU(epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _conv3(out_ch, dtype=self.dtype, name="conv_out")(h)


class VQDecoder(nn.Module):
    """(reference model.py:462-568)"""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 512
    z_channels: int = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        z = z.astype(self.dtype)
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)
        h = _conv3(block_in, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlockVQ(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(h, train)
        h = AttnBlockVQ(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlockVQ(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(h, train)
        for i_level in reversed(range(num_levels)):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlockVQ(self.ch * self.ch_mult[i_level], self.dropout,
                                  dtype=self.dtype,
                                  name=f"up_{i_level}_block_{i_block}")(h, train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlockVQ(dtype=self.dtype,
                                    name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = UpsampleVQ(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = GNSiLU(epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        return _conv3(self.out_ch, dtype=self.dtype, name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """Nearest-codebook-entry quantization with a straight-through estimator
    (taming VectorQuantizer2 semantics; reference autoencoder.py:39-41)."""

    n_embed: int = 8192
    embed_dim: int = 3
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray, with_loss: bool = False):
        # taming init: uniform in [-1/n_embed, 1/n_embed]; stored directly so torch
        # codebooks import 1:1
        bound = 1.0 / self.n_embed
        codebook = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, minval=-bound,
                                                  maxval=bound),
            (self.n_embed, self.embed_dim))

        flat = z.reshape(-1, self.embed_dim).astype(jnp.float32)
        # nearest codebook row per token; Pallas running-argmin kernel on TPU
        # (stedm_tpu/ops/quantize.py) avoids the [N, n_embed] HBM intermediate
        from stedm_tpu.ops.quantize import nearest_code

        idx = nearest_code(flat, codebook)
        z_q = codebook[idx].reshape(z.shape)
        # straight-through: gradients flow to z, values come from the codebook
        z32 = z.astype(jnp.float32)
        z_st = z32 + jax.lax.stop_gradient(z_q - z32)
        if not with_loss:
            return z_st
        # taming VectorQuantizer2 "legacy" loss (quantize.py, legacy=True — the
        # configuration ldm's VQModel uses): commitment term at weight 1, the
        # codebook term scaled by beta=0.25
        sg = jax.lax.stop_gradient
        emb_loss = (jnp.mean(jnp.square(sg(z_q) - z32))
                    + self.beta * jnp.mean(jnp.square(z_q - sg(z32))))
        return z_st, emb_loss, idx.reshape(z.shape[:-1])


class VQModelInterface(nn.Module):
    """Pre-quant encode / quantize-then-decode interface
    (reference autoencoder.py:264-282)."""

    embed_dim: int = 3
    n_embed: int = 8192
    ddconfig: dict | None = None
    dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig or {})
        dd.pop("double_z", None)
        enc_keys = ("ch", "ch_mult", "num_res_blocks", "attn_resolutions",
                    "resolution", "z_channels", "dropout")
        enc_args = {k: dd[k] for k in enc_keys if k in dd}
        self.encoder = VQEncoder(double_z=False, dtype=self.dtype, **enc_args)
        dec_args = dict(enc_args)
        if "out_ch" in dd:
            dec_args["out_ch"] = dd["out_ch"]
        self.decoder = VQDecoder(dtype=self.dtype, **dec_args)
        z_ch = dd.get("z_channels", 3)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(z_ch, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")
        self.quantize = VectorQuantizer(n_embed=self.n_embed, embed_dim=self.embed_dim)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Image -> pre-quantization latent (reference autoencoder.py:269-272)."""
        return self.quant_conv(self.encoder(x))

    def decode(self, h: jnp.ndarray, force_not_quantize: bool = False) -> jnp.ndarray:
        """Latent -> quantize -> image (reference autoencoder.py:274-282)."""
        quant = h if force_not_quantize else self.quantize(h)
        return self.decoder(self.post_quant_conv(quant))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))

    def training_recon(self, x: jnp.ndarray):
        """Full VQ training forward (the reference's **VQModel.forward**,
        autoencoder.py:126-131, which `VQModelInterface` inherits): image ->
        encode -> quantize (with the taming codebook loss) -> decode. Returns
        ``(reconstruction, emb_loss, code_indices)`` for the VAE losses
        (stedm_tpu/train/vae_losses.py). Dead on the diffusion path (the codec
        is frozen there) — used only for codec fine-tuning (train_ae.py)."""
        h = self.encode(x)
        quant, emb_loss, idx = self.quantize(h, with_loss=True)
        return self.decoder(self.post_quant_conv(quant)), emb_loss, idx
