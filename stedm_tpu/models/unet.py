"""The STEDM denoising U-Net in Flax (NHWC, bf16-friendly).

Faithful to the reference's *effective* architecture (reference
`ldm/modules/diffusionmodules/openaimodel.py:435-806`, shipped config
`conf/diffusion/unet_config/landscape.yaml`; SURVEY.md §2.5):

* conv-in, then per level ``num_res_blocks`` ResBlocks; stride-2 conv downsample
  between levels; mirrored decoder with skip concatenation and nearest-2x upsample;
* the bottleneck is ResBlock -> **ResBlockStyle** -> self-AttentionBlock -> ResBlock,
  where ResBlockStyle injects the 512-d style vector additively through the same
  FiLM-free pathway a timestep embedding uses (openaimodel.py:291-297, 627-661);
* timestep: sinusoidal(model_channels) -> MLP -> 4*model_channels
  (openaimodel.py:529-534);
* zero-initialized output convs (``zero_module``, openaimodel.py:732).

Deviations, both deliberate (SURVEY.md Q2/Q6):

* encoder/decoder `attention_resolutions` entries get a *working* self-attention (or
  SpatialTransformer) block here — in the reference those branches are dead under all
  shipped configs and would crash if reached (openaimodel.py:580-590, 689-708). The
  shipped `landscape.yaml` (ds ∈ {1,2,4}, attention_resolutions [32,16,8]) never
  triggers them, so parameter parity with the reference holds exactly.
* ``use_spatial_transformer`` swaps the bottleneck self-attention for cross-attention
  over the style token (the Q2 config-selectable path).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from stedm_tpu.models.attention import AttentionBlock, SpatialTransformer
from stedm_tpu.models.layers import (
    Downsample,
    GNSiLU,
    Upsample,
    conv1x1,
    conv3x3,
    timestep_embedding,
)

Dtype = Any


class ResBlock(nn.Module):
    """Residual block with additive (or scale-shift) embedding injection
    (reference openaimodel.py:176-288)."""

    out_channels: int | None = None
    dropout: float = 0.0
    use_conv: bool = False            # 3x3 skip instead of 1x1 when channels change
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ch = x.shape[-1]
        out_ch = self.out_channels or ch

        h = GNSiLU(dtype=self.dtype, name="in_norm")(x)
        if self.up:
            h = Upsample(use_conv=False, dtype=self.dtype)(h)
            x = Upsample(use_conv=False, dtype=self.dtype)(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = conv3x3(out_ch, dtype=self.dtype, name="in_conv")(h)

        emb_width = 2 * out_ch if self.use_scale_shift_norm else out_ch
        emb_out = nn.Dense(emb_width, dtype=self.dtype, name="emb")(
            nn.silu(emb.astype(self.dtype)))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GNSiLU(dtype=self.dtype, name="out_norm")(h, film_scale=scale,
                                                          film_shift=shift)
        else:
            # the h + emb broadcast is fused into the norm's single pass
            h = GNSiLU(dtype=self.dtype, name="out_norm")(h, add=emb_out)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, zero_init=True, dtype=self.dtype, name="out_conv")(h)

        if out_ch == ch:
            skip = x
        elif self.use_conv:
            skip = conv3x3(out_ch, dtype=self.dtype, name="skip")(x)
        else:
            skip = conv1x1(out_ch, dtype=self.dtype, name="skip")(x)
        return skip + h


class UNet(nn.Module):
    """Style- and layout-conditioned denoising U-Net (see module docstring)."""

    image_size: int = 128
    in_channels: int = 6
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 4, 8)
    conv_resample: bool = True
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    context_dim: int = 512
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    num_classes: int | None = None     # class-conditional 'adm' mode (y labels)
    use_checkpoint: bool = False       # rematerialize ResBlocks under grad — the
                                       # TPU counterpart of the reference's
                                       # per-block activation checkpointing
                                       # (openaimodel.py:263-265; trades FLOPs
                                       # for HBM via jax.checkpoint)
    attn_impl: str = "exact"           # AttentionBlock SDPA realization:
                                       # exact | chunked | flash | auto
                                       # (ops/blocked_attention.py — the
                                       # batch-32 [T,T]-logits OOM lever)
    dtype: Dtype = jnp.float32

    def _heads(self, ch: int) -> tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    def _attn(self, ch: int, name: str):
        heads, dim_head = self._heads(ch)
        if self.use_spatial_transformer:
            cls = (nn.remat(SpatialTransformer)
                   if self.use_checkpoint else SpatialTransformer)
            return cls(heads=heads, dim_head=dim_head,
                       depth=self.transformer_depth,
                       dropout=self.dropout, dtype=self.dtype, name=name)
        # the reference's use_checkpoint wraps AttentionBlock._forward too
        # (openaimodel.py:359-361) — and its fp32 [B, H, T, T] logits/softmax
        # residuals are the largest batch-32 training temps once the swin
        # windows are rematerialized (round-5 OOM dump: f32[32,8,1024,1024])
        cls = nn.remat(AttentionBlock) if self.use_checkpoint else AttentionBlock
        return cls(num_heads=heads, dtype=self.dtype, attn_impl=self.attn_impl,
                   name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 context: jnp.ndarray | None = None, y: jnp.ndarray | None = None,
                 train: bool = False, *, cache: jnp.ndarray | None = None,
                 return_cache: bool = False, cache_levels: int = 1):
        """Denoiser forward, with optional cross-step deep-feature reuse.

        The cached mode exploits that under the shipped configs attention and the
        style context only act below the shallow levels (bottleneck), so the deep
        trunk changes slowly across adjacent DDIM steps (DeepCache, Ma et al. 2023):

        * ``return_cache=True``: full forward, additionally returns the
          post-upsample hidden state entering decoder level ``cache_levels - 1``.
        * ``cache=<that tensor>``: recompute only encoder/decoder levels
          ``< cache_levels`` (skips + fresh time embedding) and splice the cached
          deep feature in — ~12% of the full FLOPs for the landscape config.

        The reference has no counterpart (it runs 2 fresh full U-Net passes per
        DDIM step, reference ddim.py:177-178); parameter names are unchanged so
        both paths share the same weights.
        """
        shallow = cache is not None
        n_levels = len(self.channel_mult)
        if shallow or return_cache:
            assert not (shallow and return_cache), "cache in and out are exclusive"
            assert 1 <= cache_levels < n_levels, \
                f"cache_levels must be in [1, {n_levels - 1}]"

        in_dtype = x.dtype
        x = x.astype(self.dtype)
        mc = self.model_channels
        time_embed_dim = mc * 4

        t_emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(
            t_emb.astype(self.dtype))
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))
        if self.num_classes is not None and y is not None:
            # class-conditional 'adm' mode (reference openaimodel.py:536-537, 790-792)
            emb = emb + nn.Embed(self.num_classes, time_embed_dim,
                                 dtype=self.dtype, name="label_emb")(y)

        # remat: recompute block activations in the backward pass instead of
        # keeping them in HBM (the reference checkpoints per block the same way,
        # openaimodel.py:263-265). `train` (arg 2) stays a static python bool.
        block_cls = (nn.remat(ResBlock, static_argnums=(2,))
                     if self.use_checkpoint else ResBlock)

        def res(out_ch, name, **kw):
            return block_cls(out_channels=out_ch, dropout=self.dropout,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=self.dtype, name=name, **kw)

        # ---- encoder -------------------------------------------------------
        # in cached mode only the shallow levels (< cache_levels) run; the
        # downsample INTO level cache_levels is skipped (its skip tensor is
        # consumed by a deep decoder block that the cache replaces)
        hs = []
        h = conv3x3(mc, dtype=self.dtype, name="input_blocks_0_0")(x)
        hs.append(h)
        ds = 1
        block_idx = 1
        enc_levels = cache_levels if shallow else n_levels
        for level in range(enc_levels):
            mult = self.channel_mult[level]
            for _ in range(self.num_res_blocks):
                h = res(mult * mc, f"input_blocks_{block_idx}_0")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = self._attn(h.shape[-1], f"input_blocks_{block_idx}_1")(h)
                hs.append(h)
                block_idx += 1
            if level != n_levels - 1 and not (shallow and level == cache_levels - 1):
                if self.resblock_updown:
                    h = res(h.shape[-1], f"input_blocks_{block_idx}_0", down=True)(h, emb, train)
                else:
                    h = Downsample(use_conv=self.conv_resample, dtype=self.dtype,
                                   name=f"input_blocks_{block_idx}_0")(h)
                hs.append(h)
                ds *= 2
                block_idx += 1

        if not shallow:
            # ---- bottleneck: ResBlock -> ResBlockStyle -> attention -> ResBlock
            ch = h.shape[-1]
            h = res(ch, "middle_block_0")(h, emb, train)
            if context is None:
                context = jnp.zeros((x.shape[0], self.context_dim), dtype=self.dtype)
            if context.shape[0] != h.shape[0]:
                # shared-encoder CFG fan-out: with style injected only at the
                # bottleneck (the active architecture), the cond/uncond branches
                # share the entire encoder. A context of batch k*B duplicates the
                # bottleneck state k ways here and the decoder runs fanned out —
                # identical math to k full passes at ~15% fewer FLOPs for k=2
                # (invalid with use_spatial_transformer, which consumes context
                # pre-bottleneck).
                assert not self.use_spatial_transformer, \
                    "shared-encoder CFG requires bottleneck-only conditioning"
                k = context.shape[0] // h.shape[0]
                h = jnp.concatenate([h] * k)
                emb = jnp.concatenate([emb] * k)
                hs = [jnp.concatenate([s] * k) for s in hs]
            # ResBlockStyle: the style vector rides the embedding pathway
            # (reference openaimodel.py:291-297, 636-643)
            h = res(ch, "middle_block_1")(h, context.astype(self.dtype), train)
            h = self._attn(ch, "middle_block_2")(h)
            h = res(ch, "middle_block_3")(h, emb, train)
        else:
            # splice the cached deep feature in; if it carries a CFG fan-out
            # (batch k*B from the full pass) fan the fresh shallow state to match
            if cache.shape[0] != h.shape[0]:
                k = cache.shape[0] // h.shape[0]
                emb = jnp.concatenate([emb] * k)
                hs = [jnp.concatenate([s] * k) for s in hs]
            h = cache.astype(self.dtype)

        # ---- decoder ---------------------------------------------------------
        cache_out = None
        dec_top = cache_levels if shallow else n_levels
        for level in range(dec_top - 1, -1, -1):
            mult = self.channel_mult[level]
            ds = 2 ** level
            for i in range(self.num_res_blocks + 1):
                block_idx = (n_levels - 1 - level) * (self.num_res_blocks + 1) + i
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(mult * mc, f"output_blocks_{block_idx}_0")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = self._attn(h.shape[-1], f"output_blocks_{block_idx}_1")(h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(h.shape[-1], f"output_blocks_{block_idx}_up", up=True)(h, emb, train)
                    else:
                        h = Upsample(use_conv=self.conv_resample, dtype=self.dtype,
                                     name=f"output_blocks_{block_idx}_up")(h)
            if return_cache and level == cache_levels:
                cache_out = h  # post-upsample state entering level cache_levels-1

        h = GNSiLU(dtype=self.dtype, name="out_norm")(h)
        h = conv3x3(self.out_channels, zero_init=True, dtype=self.dtype, name="out_conv")(h)
        out = h.astype(in_dtype)
        if return_cache:
            return out, cache_out
        return out
