"""BSRGAN degradation parity (`stedm_tpu/data/degradation.py` vs
`ldm/modules/image_degradation/`). The deterministic building blocks (MATLAB
bicubic resize, blur-kernel constructors) are compared against the reference
functions imported directly; the stochastic pipelines are checked for their
contract (shapes, dtypes, ranges, seeded determinism) since the RNG plumbing
deliberately differs (explicit np.random.Generator vs global random state).

The reference module needs import-time shims in this image: albumentations /
torchvision / matplotlib stubs and the removed ``scipy.finfo`` alias; its
``shift_pixel`` calls scipy's removed ``interp2d`` and cannot run at all, so
ours is golden-tested against a hand-computed bilinear shift instead."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_mods(request):
    import scipy

    if not hasattr(scipy, "finfo"):  # removed alias used by ref fspecial
        scipy.finfo = np.finfo
    sys.path.append(str(REFERENCE))
    # stub only what's missing, and REMOVE the stubs afterwards: a leaked empty
    # `matplotlib` stub poisons every later test in the session that imports
    # the real package (test_seg's CM figures died on exactly that)
    stubbed = []
    for name in ["albumentations", "torchvision", "torchvision.utils",
                 "matplotlib", "matplotlib.pyplot"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None
    request.addfinalizer(
        lambda: [sys.modules.pop(name, None) for name in stubbed])
    import ldm.modules.image_degradation.bsrgan as ref_bsr
    import ldm.modules.image_degradation.utils_image as ref_util
    return ref_bsr, ref_util


def test_imresize_matches_reference(ref_mods):
    _, ref_util = ref_mods
    from stedm_tpu.data.degradation import imresize

    x = np.random.default_rng(0).random((37, 53, 3)).astype(np.float32)
    for scale in (0.25, 0.5, 1 / 3, 0.75, 2.0):
        want = np.asarray(ref_util.imresize_np(x, scale, True))
        got = imresize(x, scale, True)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-6)
    # 2D (kernel-shaped) input path
    k = np.random.default_rng(1).random((16, 16)).astype(np.float32)
    np.testing.assert_allclose(imresize(k, 0.5),
                               np.asarray(ref_util.imresize_np(k, 0.5, True)),
                               atol=5e-6)


def test_blur_kernels_match_reference(ref_mods):
    ref_bsr, _ = ref_mods
    from stedm_tpu.data.degradation import (anisotropic_Gaussian, fspecial,
                                            fspecial_gaussian)

    np.testing.assert_allclose(
        anisotropic_Gaussian(15, 0.7, 4.0, 1.5),
        ref_bsr.anisotropic_Gaussian(15, 0.7, 4.0, 1.5), atol=1e-12)
    np.testing.assert_allclose(
        anisotropic_Gaussian(9, 2.9, 2.0, 2.0),
        ref_bsr.anisotropic_Gaussian(9, 2.9, 2.0, 2.0), atol=1e-12)
    np.testing.assert_allclose(fspecial_gaussian(25, 1.3),
                               ref_bsr.fspecial("gaussian", 25, 1.3),
                               atol=1e-15)
    np.testing.assert_allclose(fspecial("laplacian", 0.3),
                               ref_bsr.fspecial("laplacian", 0.3), atol=1e-15)


def test_shift_pixel_golden():
    """Integer shift (sf=3 -> 1.0 px) is an exact edge-clamped roll; the
    half-pixel part of sf=4 (1.5 px) is the mean of 1-px and 2-px shifts
    (bilinear linearity). Reference: bsrgan.py:99-125."""
    from stedm_tpu.data.degradation import shift_pixel

    rng = np.random.default_rng(2)
    x = rng.random((12, 10)).astype(np.float64)

    got1 = shift_pixel(x, 3)  # shift = 1.0
    want1 = x[np.clip(np.arange(12) + 1, 0, 11)][:, np.clip(np.arange(10) + 1,
                                                            0, 9)]
    np.testing.assert_allclose(got1, want1, atol=1e-12)

    got15 = shift_pixel(x, 4)  # shift = 1.5: mean of the 2x2 neighborhood
    ry = [np.clip(np.arange(12) + d, 0, 11) for d in (1, 2)]
    rx = [np.clip(np.arange(10) + d, 0, 9) for d in (1, 2)]
    want15 = sum(x[iy][:, ix] for iy in ry for ix in rx) / 4.0
    np.testing.assert_allclose(got15, want15, atol=1e-12)

    # 3-channel variant applies the same shift per channel
    x3 = rng.random((8, 8, 3))
    got3 = shift_pixel(x3, 3)
    for c in range(3):
        np.testing.assert_allclose(got3[:, :, c], shift_pixel(x3[:, :, c], 3),
                                   atol=1e-12)


def test_deterministic_degradations_match_reference(ref_mods):
    ref_bsr, _ = ref_mods
    from stedm_tpu.data.degradation import (bicubic_degradation,
                                            classical_degradation,
                                            dpsr_degradation,
                                            srmd_degradation)

    rng = np.random.default_rng(3)
    x = rng.random((24, 24, 3)).astype(np.float32)
    k = ref_bsr.fspecial("gaussian", 7, 1.1)
    np.testing.assert_allclose(bicubic_degradation(x, 3),
                               np.asarray(ref_bsr.bicubic_degradation(x, 3)),
                               atol=5e-6)
    np.testing.assert_allclose(srmd_degradation(x, k, 3),
                               np.asarray(ref_bsr.srmd_degradation(x, k, 3)),
                               atol=5e-6)
    np.testing.assert_allclose(dpsr_degradation(x, k, 3),
                               np.asarray(ref_bsr.dpsr_degradation(x, k, 3)),
                               atol=5e-6)
    np.testing.assert_allclose(classical_degradation(x, k, 3),
                               ref_bsr.classical_degradation(x, k, 3),
                               atol=1e-6)


def test_jpeg_noise_is_a_real_jpeg_roundtrip():
    from stedm_tpu.data.degradation import add_JPEG_noise

    rng = np.random.default_rng(4)
    img = rng.random((32, 32, 3)).astype(np.float32)
    out_hi = add_JPEG_noise(img, quality_factor=95)
    out_lo = add_JPEG_noise(img, quality_factor=30)
    assert out_hi.shape == img.shape and out_hi.dtype == np.float32
    assert out_hi.min() >= 0.0 and out_hi.max() <= 1.0
    # lower quality must lose strictly more signal on a noise image
    assert np.abs(out_lo - img).mean() > np.abs(out_hi - img).mean()


def test_variant_pipeline_contract_and_determinism():
    from stedm_tpu.data.degradation import (degradation_fn_bsr,
                                            degradation_fn_bsr_light)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    for fn in (degradation_fn_bsr, degradation_fn_bsr_light):
        out = fn(img, sf=4, rng=np.random.default_rng(7))
        assert set(out) == {"image"}
        lq = out["image"]
        # whether or not the pre-halving branch fires, sf is rescaled so the
        # final size is always input/sf (bsrgan.py:553-595)
        assert lq.shape == (24, 24, 3) and lq.dtype == np.uint8
        again = fn(img, sf=4, rng=np.random.default_rng(7))["image"]
        np.testing.assert_array_equal(lq, again)
        other = fn(img, sf=4, rng=np.random.default_rng(8))["image"]
        assert not np.array_equal(lq, other)


def test_paired_pipelines_contract():
    from stedm_tpu.data.degradation import (degradation_bsrgan,
                                            degradation_bsrgan_plus)

    rng = np.random.default_rng(6)
    img = rng.random((128, 128, 3)).astype(np.float32)
    for fn in (degradation_bsrgan, degradation_bsrgan_plus):
        lq, hq = fn(img, sf=2, lq_patchsize=32, rng=np.random.default_rng(9))
        assert lq.shape == (32, 32, 3)
        assert hq.shape == (64, 64, 3)
        assert lq.min() >= 0.0 and lq.max() <= 1.0
    with pytest.raises(ValueError, match="too small"):
        degradation_bsrgan(img, sf=2, lq_patchsize=100,
                           rng=np.random.default_rng(0))
