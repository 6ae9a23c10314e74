"""InceptionV3 pool3 featurizer for standard-comparable FID (NHWC, fp32).

Replicates the torchvision/pytorch-fid InceptionV3 graph (the network behind the
BASELINE.json "FID parity" metric; the reference repo itself computes no FID —
the paper's numbers use the standard pool3 features). Two fidelity details from
pytorch-fid's patched blocks: branch-pool average pooling uses
``count_include_pad=False``, and Mixed_7c uses MAX pooling in its pool branch
(matching the original TF graph, pytorch-fid ``FIDInceptionE_2``).

BatchNorms are folded into the conv kernels/biases at import time
(`stedm_tpu.utils.torch_import.map_inception`), so this module is plain
conv+bias+relu — module names mirror the torch key paths (dots -> underscores)
to make the mapping mechanical. Weights come from a staged torch checkpoint
(`pt_inception-2015-12-05` or any state_dict with the torchvision layout); no
egress in this image. Validated against a hand-built torch twin in
tests/test_inception_fid.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _avg_pool_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool, zero pad, count_include_pad=False."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max_pool(x: jnp.ndarray, stride: int = 2, pad: int = 0) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(stride, stride),
                       padding=((pad, pad),) * 2)


class InceptionV3FID(nn.Module):
    """Input [B, H, W, 3] in [-1, 1] (caller resizes to 299) -> [B, 2048]."""

    dtype: Dtype = jnp.float32

    def _conv(self, x, name: str, ch: int, kernel, stride=1, pad=0):
        if isinstance(kernel, int):
            kernel = (kernel, kernel)
        if isinstance(pad, int):
            pad = (pad, pad)
        y = nn.Conv(ch, kernel, strides=(stride, stride),
                    padding=(((pad[0],) * 2), ((pad[1],) * 2)),
                    dtype=self.dtype, name=name)(x)
        return nn.relu(y)

    def _inception_a(self, x, name: str, pool_features: int):
        c = self._conv
        b1 = c(x, f"{name}_branch1x1", 64, 1)
        b5 = c(x, f"{name}_branch5x5_1", 48, 1)
        b5 = c(b5, f"{name}_branch5x5_2", 64, 5, pad=2)
        b3 = c(x, f"{name}_branch3x3dbl_1", 64, 1)
        b3 = c(b3, f"{name}_branch3x3dbl_2", 96, 3, pad=1)
        b3 = c(b3, f"{name}_branch3x3dbl_3", 96, 3, pad=1)
        bp = c(_avg_pool_3x3(x), f"{name}_branch_pool", pool_features, 1)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def _inception_b(self, x, name: str):
        c = self._conv
        b3 = c(x, f"{name}_branch3x3", 384, 3, stride=2)
        bd = c(x, f"{name}_branch3x3dbl_1", 64, 1)
        bd = c(bd, f"{name}_branch3x3dbl_2", 96, 3, pad=1)
        bd = c(bd, f"{name}_branch3x3dbl_3", 96, 3, stride=2)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)

    def _inception_c(self, x, name: str, c7: int):
        c = self._conv
        b1 = c(x, f"{name}_branch1x1", 192, 1)
        b7 = c(x, f"{name}_branch7x7_1", c7, 1)
        b7 = c(b7, f"{name}_branch7x7_2", c7, (1, 7), pad=(0, 3))
        b7 = c(b7, f"{name}_branch7x7_3", 192, (7, 1), pad=(3, 0))
        bd = c(x, f"{name}_branch7x7dbl_1", c7, 1)
        bd = c(bd, f"{name}_branch7x7dbl_2", c7, (7, 1), pad=(3, 0))
        bd = c(bd, f"{name}_branch7x7dbl_3", c7, (1, 7), pad=(0, 3))
        bd = c(bd, f"{name}_branch7x7dbl_4", c7, (7, 1), pad=(3, 0))
        bd = c(bd, f"{name}_branch7x7dbl_5", 192, (1, 7), pad=(0, 3))
        bp = c(_avg_pool_3x3(x), f"{name}_branch_pool", 192, 1)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)

    def _inception_d(self, x, name: str):
        c = self._conv
        b3 = c(x, f"{name}_branch3x3_1", 192, 1)
        b3 = c(b3, f"{name}_branch3x3_2", 320, 3, stride=2)
        b7 = c(x, f"{name}_branch7x7x3_1", 192, 1)
        b7 = c(b7, f"{name}_branch7x7x3_2", 192, (1, 7), pad=(0, 3))
        b7 = c(b7, f"{name}_branch7x7x3_3", 192, (7, 1), pad=(3, 0))
        b7 = c(b7, f"{name}_branch7x7x3_4", 192, 3, stride=2)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)

    def _inception_e(self, x, name: str, pool: str):
        c = self._conv
        b1 = c(x, f"{name}_branch1x1", 320, 1)
        b3 = c(x, f"{name}_branch3x3_1", 384, 1)
        b3 = jnp.concatenate([
            c(b3, f"{name}_branch3x3_2a", 384, (1, 3), pad=(0, 1)),
            c(b3, f"{name}_branch3x3_2b", 384, (3, 1), pad=(1, 0))], axis=-1)
        bd = c(x, f"{name}_branch3x3dbl_1", 448, 1)
        bd = c(bd, f"{name}_branch3x3dbl_2", 384, 3, pad=1)
        bd = jnp.concatenate([
            c(bd, f"{name}_branch3x3dbl_3a", 384, (1, 3), pad=(0, 1)),
            c(bd, f"{name}_branch3x3dbl_3b", 384, (3, 1), pad=(1, 0))], axis=-1)
        pooled = _avg_pool_3x3(x) if pool == "avg" else _max_pool(x, stride=1, pad=1)
        bp = c(pooled, f"{name}_branch_pool", 192, 1)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self._conv
        x = x.astype(self.dtype)
        x = c(x, "Conv2d_1a_3x3", 32, 3, stride=2)
        x = c(x, "Conv2d_2a_3x3", 32, 3)
        x = c(x, "Conv2d_2b_3x3", 64, 3, pad=1)
        x = _max_pool(x)
        x = c(x, "Conv2d_3b_1x1", 80, 1)
        x = c(x, "Conv2d_4a_3x3", 192, 3)
        x = _max_pool(x)
        x = self._inception_a(x, "Mixed_5b", 32)
        x = self._inception_a(x, "Mixed_5c", 64)
        x = self._inception_a(x, "Mixed_5d", 64)
        x = self._inception_b(x, "Mixed_6a")
        x = self._inception_c(x, "Mixed_6b", 128)
        x = self._inception_c(x, "Mixed_6c", 160)
        x = self._inception_c(x, "Mixed_6d", 160)
        x = self._inception_c(x, "Mixed_6e", 192)
        x = self._inception_d(x, "Mixed_7a")
        x = self._inception_e(x, "Mixed_7b", pool="avg")
        x = self._inception_e(x, "Mixed_7c", pool="max")  # FIDInceptionE_2
        return x.mean(axis=(1, 2)).astype(jnp.float32)    # adaptive avg pool
