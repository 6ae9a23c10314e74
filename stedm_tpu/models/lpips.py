"""LPIPS perceptual distance (VGG16 backbone + learned linear heads), NHWC.

TPU-native rebuild of the perceptual term used by the reference's VAE losses
(reference ldm/modules/losses/vqperceptual.py:7 imports
``taming.modules.losses.lpips.LPIPS``; the taming implementation wraps a frozen
torchvision VGG16 and per-layer 1x1 "lin" heads trained by Zhang et al.,
arXiv 1801.03924). The reference ships this path **dead** (vq-f4.yaml sets
``lossconfig: torch.nn.Identity``) but accepts it via config; we provide the
same capability for codec fine-tuning (`train_ae.py`).

Design notes (TPU-first):
- Plain conv+relu NHWC graph — XLA fuses the normalize/diff/head chain; the
  whole distance is one fused program when jitted together with the caller.
- Module names mirror the torch state-dict key paths (dots -> underscores) so
  the checkpoint mapping (`stedm_tpu.utils.torch_import.map_lpips`) is
  mechanical: VGG convs are ``net_slice{K}_{idx}`` for torchvision
  ``features.{idx}``, heads are ``lin{k}_model_1`` for taming
  ``lin{k}.model.1``.
- Weights: taming's ``vgg.pth`` ("vgg_lpips") checkpoint carries ONLY the lin
  heads + the scaling buffers; the VGG16 backbone comes from the torchvision
  ImageNet checkpoint. Neither is staged in this image (no egress) — the
  importer takes either/both state_dicts; architecture is validated against a
  hand-built torch twin with random weights (tests/test_vae_losses.py).

Inputs are NHWC in [-1, 1] (same contract as taming's ScalingLayer).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# taming ScalingLayer buffers (lpips.py ScalingLayer): shift/scale that map
# [-1,1] inputs onto the ImageNet-normalized range VGG was trained on.
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# torchvision VGG16 ``features`` conv indices grouped by taming's five slices
# (slice boundaries 4/9/16/23/30 = the max-pool positions); outputs are
# relu1_2 .. relu5_3 with channel counts 64/128/256/512/512.
_SLICES: Sequence[Sequence[tuple[int, int]]] = (
    ((0, 64), (2, 64)),
    ((5, 128), (7, 128)),
    ((10, 256), (12, 256), (14, 256)),
    ((17, 512), (19, 512), (21, 512)),
    ((24, 512), (26, 512), (28, 512)),
)
CHNS = (64, 128, 256, 512, 512)


def _normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """taming ``normalize_tensor``: unit-normalize across channels."""
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


class VGG16Features(nn.Module):
    """VGG16 ``features`` trunk emitting the five LPIPS slice activations."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        outs = []
        for si, convs in enumerate(_SLICES):
            if si:  # a 2x2/2 max pool separates consecutive slices
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for idx, ch in convs:
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype,
                            name=f"net_slice{si + 1}_{idx}")(x)
                x = nn.relu(x)
            outs.append(x)
        return outs


class LPIPS(nn.Module):
    """Per-sample perceptual distance, shape [B, 1, 1, 1] like taming's
    (keepdim spatial_average + summed heads) so it broadcasts against NHWC
    pixel losses exactly as the reference's ``rec_loss + w * p_loss`` does."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        net = VGG16Features(dtype=self.dtype, name="net")
        fx = net((x.astype(self.dtype) - shift) / scale)
        fy = net((y.astype(self.dtype) - shift) / scale)
        total = 0.0
        for k, (ax, ay) in enumerate(zip(fx, fy)):
            diff = jnp.square(_normalize(ax) - _normalize(ay))
            # taming NetLinLayer: 1x1 conv, no bias (dropout inactive in eval)
            head = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                           name=f"lin{k}_model_1")(diff)
            total = total + head.mean(axis=(1, 2), keepdims=True)
        return total.astype(jnp.float32)
