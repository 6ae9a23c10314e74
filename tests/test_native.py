"""Native C++ kernel tests: bit-exact agreement with the numpy reference paths.
Skipped when no C++ toolchain/library is available."""

import numpy as np
import pytest

from stedm_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_consensus_matches_numpy():
    from stedm_tpu.data.prep import consensus_stack_numpy

    rng = np.random.default_rng(7)
    stack = rng.integers(0, 7, (5, 64, 48)).astype(np.uint8)
    v_n, s_n = native.consensus_stack_native(stack)
    v_p, s_p = consensus_stack_numpy(stack)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_array_equal(s_n, s_p)


def test_consensus_even_annotators():
    from stedm_tpu.data.prep import consensus_stack_numpy

    rng = np.random.default_rng(8)
    stack = rng.integers(0, 7, (4, 32, 32)).astype(np.uint8)
    v_n, s_n = native.consensus_stack_native(stack)
    v_p, s_p = consensus_stack_numpy(stack)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_array_equal(s_n, s_p)


def test_extract_patch_padding():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 60, 3), dtype=np.uint8)
    out = native.extract_patch_native(img, -5, 10, 32, 255)
    ref = np.full((32, 32, 3), 255, np.uint8)
    ref[5:, 0:32] = img[0:27, 10:42]
    np.testing.assert_array_equal(out, ref)
    # fully out of bounds -> all fill
    out = native.extract_patch_native(img, -100, -100, 16, 7)
    np.testing.assert_array_equal(out, np.full((16, 16, 3), 7))


def test_downscale_mean():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    out = native.downscale_mean_native(img, 4)
    ref = img.reshape(12, 4, 12, 4, 3).mean(axis=(1, 3))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1  # int truncation
