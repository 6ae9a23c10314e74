"""Device-side batch synthesis for the trained-flagship calibration tool.

tools/calibrate_flagship.py trains the bench flagship ON CHIP with batches
generated inside a jitted program (host-staged batches would crawl through
the ~30 MB/s tunnel). This checks the synthesized distribution has the same
contract as tools/deepcache_quality.make_batch: NHWC image in [-1,1],
two-channel complementary one-hot layout, style stack = image.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.calibrate_flagship import make_device_batch  # noqa: E402


def test_device_batch_contract():
    b = jax.jit(lambda k: make_device_batch(k, 4, 32))(jax.random.PRNGKey(0))
    img = np.asarray(b["image"])
    seg = np.asarray(b["segmentation"])
    sty = np.asarray(b["style_imgs"])
    assert img.shape == (4, 32, 32, 3) and seg.shape == (4, 32, 32, 2)
    assert sty.shape == (4, 1, 32, 32, 3)
    assert -1.0 <= img.min() and img.max() <= 1.0
    # complementary one-hot layout with a real foreground rectangle
    assert np.array_equal(seg.sum(-1), np.ones((4, 32, 32), np.float32))
    frac = seg[..., 1].mean(axis=(1, 2))
    assert np.all(frac > 0.01) and np.all(frac < 0.9)
    # style stack is the image itself (same contract as make_batch)
    assert np.allclose(sty[:, 0], img)


def test_device_batch_varies_with_key():
    f = jax.jit(lambda k: make_device_batch(k, 2, 16))
    a = f(jax.random.PRNGKey(1))
    b = f(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a["image"]), np.asarray(b["image"]))


if __name__ == "__main__":
    import pytest

    pytest.main([__file__, "-q"])
