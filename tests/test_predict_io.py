"""predict_diff I/O paths: device-side uint8 PNG quantization and the opt-in
compact conditioning transfer (predict_diff.py `to_u8` / `+compact_transfer`).

The uint8 conversion moved on-device in round 3 (4x smaller D2H readback on
slow-transfer terminals); it must reproduce the former host-side
``((img + 1) * 127.5).astype(np.uint8)`` bit-exactly. The compact transfer
H2Ds the seg as uint8 class indices — lossless for the binary 2-channel
layout protocol (train_diff.batch_to_ldm) — and the style as float16 (lossy,
which is why the knob defaults off).
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_device_u8_matches_host_quantization():
    to_u8 = jax.jit(lambda x: ((x + 1.0) * 127.5).astype(jnp.uint8))
    rng = np.random.default_rng(0)
    x = np.clip(rng.uniform(-1.2, 1.2, (4, 8, 8, 3)), -1, 1).astype(np.float32)
    # exact boundary / near-boundary values, incl. cast-truncation edges
    x[0, 0, 0] = [-1.0, 1.0, 0.0]
    x[0, 0, 1] = [127.0 / 127.5 - 1.0, 128.0 / 127.5 - 1.0, -0.999999]
    host = ((x + 1.0) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(to_u8(x)), host)


def test_compact_seg_roundtrip_is_exact():
    """one_hot(argmax(seg2)) == seg2 for the batch protocol's 2-channel layout
    (binary complementary channels after the one-hot collapse)."""
    rng = np.random.default_rng(1)
    fg = (rng.uniform(size=(3, 16, 16)) > 0.7).astype(np.float32)
    seg2 = np.stack([1.0 - fg, fg], axis=-1)
    idx = np.argmax(seg2, axis=-1).astype(np.uint8)
    expand = jax.jit(lambda s: jax.nn.one_hot(s, 2, dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(expand(idx)), seg2)


def test_compact_style_f16_error_is_bounded():
    """The f16 style cast is the only lossy piece of compact_transfer; its
    quantization error must stay ~f16 resolution (documented as ~5e-4)."""
    rng = np.random.default_rng(2)
    style = rng.uniform(-1, 1, (2, 1, 32, 32, 3)).astype(np.float32)
    back = style.astype(np.float16).astype(np.float32)
    assert np.max(np.abs(back - style)) < 5e-4
