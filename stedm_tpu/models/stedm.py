"""The composite style-extracting latent diffusion model.

Functional equivalent of the reference's `S_ZSS_DM` (reference
`networks/s_zss_dm.py:11-60`) ⊂ `LatentDiffusion` (`ldm/models/diffusion/ddpm.py:427`)
⊂ `DiffusionWrapper` with ``conditioning_key='hybrid'`` (ddpm.py:1398-1424):

* first stage: frozen VQ-f4 codec (pre-quant encode / quantize-then-decode),
* cond stage: trainable SpatialRescaler over the 2-channel one-hot layout,
* style: a backbone (Swin-V2-T) + aggregation block, or a set-ViT, producing a 512-d
  style vector,
* denoiser: the U-Net, with 'hybrid' conditioning — layout conditioning is
  channel-concatenated to the noisy latent, the style vector rides the context input
  (ddpm.py:1414-1417).

This module only defines structure + pure sub-applies; train/sample drivers in
`stedm_tpu/train/` compose them with the schedule math under jit/pjit.

Batch protocol (channels-last, SURVEY.md §2.7): ``image`` [B,P,P,3] in [-1,1],
``segmentation`` [B,P,P,2] one-hot (BG vs any-FG, collapsed like
`modules/ldm_diffusion.py:51-60`), ``style_imgs`` [B,N,P,P,3] in [-1,1]
(constant -2 = dropped style).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from stedm_tpu.models.agg import AggLinear, AggMax, AggMean, AggNone
from stedm_tpu.models.cond import SpatialRescaler
from stedm_tpu.models.svit import SViT
from stedm_tpu.models.swin import swin_v2_tiny
from stedm_tpu.models.unet import UNet
from stedm_tpu.models.vq import VQModelInterface

Dtype = Any

# parameter groups that the optimizer must NOT update (frozen first stage,
# reference ddpm.py:505-510)
FROZEN_PARAM_GROUPS = ("first_stage",)


class STEDM(nn.Module):
    unet_config: dict
    first_stage_config: dict
    cond_stage_config: dict
    style_agg: str = "linear"          # linear | max | mean | svit | none
    style_sampling: str = "nearby"     # none disables the style branch entirely
    num_style_patches: int = 1
    patch_size: int = 512
    encoder: str = "swin_v2_t"
    svit_config: dict | None = None
    scale_factor: float = 1.0
    conditioning_key: str = "hybrid"   # hybrid | concat | crossattn | adm | none
    dtype: Dtype = jnp.float32
    # rematerialize the swin window-attention core under grad (kills the fp32
    # [B*win, heads, 64, 64] logits/softmax residuals — the largest training
    # temps at 2x lane padding; VERDICT r4 task 2a). Bit-identical numerics;
    # no effect on inference. False restores the store-everything behavior.
    swin_remat_attn: bool = True

    def setup(self):
        self.unet = UNet(dtype=self.dtype, name="unet", **self.unet_config)
        self.first_stage = VQModelInterface(dtype=self.dtype, name="first_stage",
                                            **self.first_stage_config)
        self.cond_stage = SpatialRescaler(dtype=self.dtype, name="cond_stage",
                                          **self.cond_stage_config)

        # style branch selection (reference s_zss_dm.py:22-40)
        if self.style_sampling == "none":
            self.agg_block = AggNone(name="agg")
        elif self.style_agg == "svit":
            svit_args = dict(self.svit_config or {})
            svit_args.pop("name", None)
            self.agg_block = SViT(image_size=self.patch_size, num_classes=512,
                                  ns=self.num_style_patches, dtype=self.dtype,
                                  name="agg", **svit_args)
        else:
            embedder = swin_v2_tiny(num_classes=512, dtype=self.dtype,
                                    remat_attn=self.swin_remat_attn)
            blocks = {"linear": lambda: AggLinear(embedder, self.num_style_patches,
                                                  dtype=self.dtype, name="agg"),
                      "max": lambda: AggMax(embedder, dtype=self.dtype, name="agg"),
                      "mean": lambda: AggMean(embedder, dtype=self.dtype, name="agg")}
            if self.style_agg not in blocks:
                raise ValueError(f"Unknown aggregation function '{self.style_agg}'")
            self.agg_block = blocks[self.style_agg]()

    # ---- first stage (frozen) -------------------------------------------

    def encode_first_stage(self, x: jnp.ndarray) -> jnp.ndarray:
        """Image -> scaled pre-quant latent, no gradient (reference ddpm.py:656-664,
        864-866; batched here, fixing SURVEY.md Q5)."""
        z = self.first_stage.encode(x)
        return jax.lax.stop_gradient(self.scale_factor * z.astype(jnp.float32))

    def decode_first_stage(self, z: jnp.ndarray,
                           force_not_quantize: bool = False) -> jnp.ndarray:
        """Latent -> image (reference ddpm.py:708-730)."""
        return self.first_stage.decode(z.astype(jnp.float32) / self.scale_factor,
                                       force_not_quantize)

    # ---- conditioning ----------------------------------------------------

    def cond_encode(self, seg_onehot: jnp.ndarray) -> jnp.ndarray:
        """One-hot layout -> latent-grid conditioning (reference ddpm.py:554-565 via
        SpatialRescaler)."""
        return self.cond_stage(seg_onehot)

    def style_encode(self, style_imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Style set [B,N,P,P,3] -> 512-d style vector (reference s_zss_dm.py:55)."""
        return self.agg_block(style_imgs, train=train)

    # ---- denoiser --------------------------------------------------------

    def eps(self, z_noisy: jnp.ndarray, t: jnp.ndarray, seg_cond: jnp.ndarray,
            style: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Conditioning dispatch (reference DiffusionWrapper, ddpm.py:1398-1424).
        Active mode 'hybrid': layout conditioning channel-concatenated to the noisy
        latent, style riding the context input; the other reference modes are kept
        config-selectable."""
        key = self.conditioning_key
        x = z_noisy.astype(self.dtype)
        if key in ("hybrid", "concat"):
            x = jnp.concatenate([x, seg_cond.astype(self.dtype)], axis=-1)
        if key == "concat" or key == "none" or key is None:
            out = self.unet(x, t, train=train)
        elif key == "adm":
            out = self.unet(x, t, y=style, train=train)  # class-conditional path
        else:  # hybrid / crossattn
            out = self.unet(x, t, context=style, train=train)
        return out.astype(jnp.float32)

    def eps_full(self, z_noisy: jnp.ndarray, t: jnp.ndarray, seg_cond: jnp.ndarray,
                 style: jnp.ndarray, cache_levels: int = 1):
        """Full eps plus the deep-feature cache for cross-step reuse (DeepCache-
        style serving mode; no reference counterpart — the reference recomputes two
        full U-Net passes per DDIM step, reference ddim.py:177-178). Only the
        active 'hybrid'/'concat' conditioning paths support caching (style enters
        at the bottleneck, inside the cached trunk)."""
        if self.conditioning_key not in ("hybrid", "concat"):
            raise ValueError("deep-feature caching requires hybrid/concat conditioning")
        x = jnp.concatenate([z_noisy.astype(self.dtype),
                             seg_cond.astype(self.dtype)], axis=-1)
        ctx = style if self.conditioning_key == "hybrid" else None
        out, cache = self.unet(x, t, context=ctx, return_cache=True,
                               cache_levels=cache_levels)
        return out.astype(jnp.float32), cache

    def eps_cached(self, z_noisy: jnp.ndarray, t: jnp.ndarray, seg_cond: jnp.ndarray,
                   cache: jnp.ndarray, cache_levels: int = 1) -> jnp.ndarray:
        """Shallow eps reusing a deep-feature cache from `eps_full` (fresh time
        embedding + shallow levels only; any CFG fan-out rides in via the cache's
        batch dim)."""
        if self.conditioning_key not in ("hybrid", "concat"):
            raise ValueError("deep-feature caching requires hybrid/concat conditioning")
        x = jnp.concatenate([z_noisy.astype(self.dtype),
                             seg_cond.astype(self.dtype)], axis=-1)
        out = self.unet(x, t, cache=cache, cache_levels=cache_levels)
        return out.astype(jnp.float32)

    def __call__(self, image: jnp.ndarray, segmentation: jnp.ndarray,
                 style_imgs: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray | None = None, train: bool = False) -> jnp.ndarray:
        """Full conditioned forward used for init and smoke tests: encodes all
        conditioning and predicts eps for `q_sample(z, t, noise)`."""
        z = self.encode_first_stage(image)
        seg_cond = self.cond_encode(segmentation)
        style = self.style_encode(style_imgs, train=train)
        if noise is None:
            noise = jnp.zeros_like(z)
        eps = self.eps(z + noise, t, seg_cond, style, train=train)
        # touch the decode path too so quantizer/decoder parameters initialize
        self.decode_first_stage(z)
        return eps


def build_stedm(cfg, dtype=None) -> STEDM:
    """Construct the composite model from a composed config (see configs/)."""
    diff = cfg.diffusion
    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        diff.get("compute_dtype", "float32")] if dtype is None else dtype

    unet_params = dict(diff.unet_config.params)
    unet_params.pop("image_size", None)  # shapes are data-driven in JAX
    fs_params = dict(diff.first_stage_config.params)
    fs_params.pop("ckpt_path", None)
    fs_params.pop("monitor", None)
    fs_params["ddconfig"] = dict(fs_params["ddconfig"])
    cs_params = dict(diff.cond_stage_config.params)

    sampling = cfg.style_sampling
    num_patches = sampling.get("num_patches", 1) if sampling.name == "mp" else 1
    svit_cfg = None
    if cfg.get("style_agg") and cfg.style_agg.name == "svit":
        svit_cfg = {k: v for k, v in dict(cfg.style_agg).items() if k != "name"}

    return STEDM(
        unet_config=unet_params,
        first_stage_config=fs_params,
        cond_stage_config=cs_params,
        style_agg=cfg.get("style_agg", {"name": "linear"})["name"] if cfg.get("style_agg") else "linear",
        style_sampling=sampling.name,
        num_style_patches=num_patches,
        patch_size=cfg.data.patch_size,
        svit_config=svit_cfg,
        scale_factor=diff.get("scale_factor", 1.0),
        conditioning_key=diff.get("conditioning_key", "hybrid"),
        dtype=compute_dtype,
    )
