"""EncoderUNetModel — the half U-Net classifier (dead in the shipped reference
configs; used upstream for classifier guidance).

Reference `ldm/modules/diffusionmodules/openaimodel.py:809-1024` +
`AttentionPool2d` (openaimodel.py:33-60, the CLIP-style pooler). Same encoder
trunk as `stedm_tpu/models/unet.py:UNet` (shared ResBlock / AttentionBlock /
Downsample modules and parameter naming, so the torch importer reuses the
U-Net mappers), followed by one of four pooling heads:

* ``adaptive`` — GN+SiLU, global average pool, zero-init projection;
* ``attention`` — GN+SiLU, CLIP attention pool over (HW+1) tokens;
* ``spatial`` / ``spatial_v2`` — per-block spatial means concatenated into an
  MLP (2048 hidden; v2 inserts a GroupNorm32+SiLU).

NHWC, params fp32, compute dtype configurable — norms stay fp32 via GNSiLU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stedm_tpu.models.attention import AttentionBlock
from stedm_tpu.models.layers import Downsample, GNSiLU, conv3x3, timestep_embedding
from stedm_tpu.models.unet import ResBlock

Dtype = Any


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (openaimodel.py:33-60): prepend the mean
    token, add a learned positional embedding, one multi-head self-attention
    ("new order" channel layout), and read out the mean token's projection."""

    spacial_dim: int
    num_head_channels: int
    output_dim: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        heads = c // self.num_head_channels
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        # reference stores (C, HW+1); we keep the natural (HW+1, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=c ** -0.5),
                         (self.spacial_dim ** 2 + 1, c))
        seq = seq + pos[None].astype(seq.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(seq)
        # channel-major head split: index h*dh+d, matching QKVAttention's
        # chunk(3, dim=1) + per-head reshape (openaimodel.py:391-404)
        n = seq.shape[1]
        q, k, v = [t.reshape(b, n, heads, self.num_head_channels)
                   for t in jnp.split(qkv, 3, axis=-1)]
        scale = self.num_head_channels ** -0.5
        logits = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
        attn = jax.nn.softmax(logits.astype(jnp.float32),
                              axis=-1).astype(logits.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, c)
        out = nn.Dense(self.output_dim or c, dtype=self.dtype,
                       name="c_proj")(out)
        return out[:, 0]


class EncoderUNetModel(nn.Module):
    """Half U-Net with timestep embedding and a pooled classification head
    (openaimodel.py:809-1024)."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    pool: str = "adaptive"
    dtype: Dtype = jnp.float32

    def _attn(self, ch: int, name: str) -> AttentionBlock:
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            heads = ch // self.num_head_channels
        return AttentionBlock(num_heads=heads, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        if self.pool not in ("adaptive", "attention", "spatial", "spatial_v2"):
            raise NotImplementedError(f"Unexpected {self.pool} pooling")
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        mc = self.model_channels
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_0")(
            timestep_embedding(timesteps, mc).astype(self.dtype))
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        def res(out_ch, name, **kw):
            return ResBlock(out_channels=out_ch, dropout=self.dropout,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            dtype=self.dtype, name=name, **kw)

        spatial = self.pool.startswith("spatial")
        results = []

        def tap(h):
            # per-block spatial mean in the input dtype (openaimodel.py:1016)
            if spatial:
                results.append(h.astype(in_dtype).mean(axis=(1, 2)))

        h = conv3x3(mc, dtype=self.dtype, name="input_blocks_0_0")(x)
        tap(h)
        ds, block_idx = 1, 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res(mult * mc, f"input_blocks_{block_idx}_0")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = self._attn(h.shape[-1], f"input_blocks_{block_idx}_1")(h)
                tap(h)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(h.shape[-1], f"input_blocks_{block_idx}_0",
                            down=True)(h, emb, train)
                else:
                    h = Downsample(use_conv=self.conv_resample, dtype=self.dtype,
                                   name=f"input_blocks_{block_idx}_0")(h)
                tap(h)
                ds *= 2
                block_idx += 1

        ch = h.shape[-1]
        h = res(ch, "middle_block_0")(h, emb, train)
        h = self._attn(ch, "middle_block_1")(h)
        h = res(ch, "middle_block_2")(h, emb, train)
        tap(h)

        if self.pool == "adaptive":
            h = GNSiLU(dtype=self.dtype, name="out_norm")(h)
            h = h.mean(axis=(1, 2))
            h = nn.Dense(self.out_channels, kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, name="out_conv")(h)
            return h.astype(in_dtype)
        if self.pool == "attention":
            assert self.num_head_channels != -1
            h = GNSiLU(dtype=self.dtype, name="out_norm")(h)
            h = AttentionPool2d(spacial_dim=self.image_size // ds,
                                num_head_channels=self.num_head_channels,
                                output_dim=self.out_channels,
                                dtype=self.dtype, name="attn_pool")(h)
            return h.astype(in_dtype)

        feats = jnp.concatenate(results, axis=-1).astype(self.dtype)
        h = nn.Dense(2048, dtype=self.dtype, name="out_0")(feats)
        if self.pool == "spatial_v2":
            # normalization(2048) on a vector: GroupNorm32 over channels
            h = GNSiLU(dtype=self.dtype, name="out_norm")(h[:, None, None, :])
            h = h[:, 0, 0, :]
        else:
            h = nn.relu(h)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="out_3")(h)
        return h.astype(in_dtype)
