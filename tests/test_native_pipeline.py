"""Native WSI patch pipeline: exact parity with the numpy wsi_sample path
(crop + white fill + block-mean downscale), including off-slide edges, the
batched async pool, and the wsi_sample fast-path dispatch."""

import numpy as np
import pytest

from stedm_tpu import native
from stedm_tpu.data.wsi import ArraySlide, wsi_sample, wsi_sample_batch

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


@pytest.fixture(scope="module")
def slide():
    rng = np.random.default_rng(0)
    return ArraySlide(rng.integers(0, 255, (256, 320, 3), dtype=np.uint8))


def _python_wsi_sample(slide, offset, p_size, b_scale, pos, monkeypatch):
    """Force the numpy path by disabling the native fast path."""
    monkeypatch.setattr(native, "wsi_patch_native", lambda *a, **k: None)
    out = wsi_sample(slide, offset, p_size, b_scale, pos)
    monkeypatch.undo()
    return out


@pytest.mark.parametrize("b_scale", [1, 2, 4, 8])
@pytest.mark.parametrize("pos", [(128, 160), (4, 4), (250, 316), (-20, 400)])
def test_fast_path_matches_numpy(slide, monkeypatch, b_scale, pos):
    # b_scale 1/2 hit pyramid levels directly; 8 needs a residual downscale when
    # the pyramid is shallow; edge positions exercise the white fill
    p = 32
    want = _python_wsi_sample(slide, (3, -5), p, b_scale, pos, monkeypatch)
    got = wsi_sample(slide, (3, -5), p, b_scale, pos)
    np.testing.assert_array_equal(got, want)


def test_batch_matches_singles(slide):
    rng = np.random.default_rng(1)
    positions = [(int(y), int(x)) for y, x in rng.integers(-30, 300, (16, 2))]
    batch = wsi_sample_batch(slide, (0, 0), 24, 2, positions)
    assert batch.shape == (16, 24, 24, 3)
    for i, pos in enumerate(positions):
        np.testing.assert_array_equal(batch[i],
                                      wsi_sample(slide, (0, 0), 24, 2, pos))


def test_async_pool_overlaps_and_orders():
    from stedm_tpu.data.native_pipeline import AsyncPatchPipeline

    rng = np.random.default_rng(2)
    level = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    pipe = AsyncPatchPipeline(n_workers=4)
    tickets = []
    coords_all = []
    for _ in range(8):  # several in-flight batches at once
        coords = rng.integers(-10, 120, (32, 2))
        coords_all.append(coords)
        tickets.append(pipe.submit(level, coords, 16, 2))
    for coords, t in zip(coords_all, tickets):
        out = t.get()
        for i, (y0, x0) in enumerate(coords):
            want = native.wsi_patch_native(level, int(y0), int(x0), 16, 2)
            np.testing.assert_array_equal(out[i], want)


def test_kernel_white_fill_and_downscale():
    level = np.full((8, 8, 3), 100, np.uint8)
    # fully outside -> pure white
    out = native.wsi_patch_native(level, -100, -100, 4, 2)
    np.testing.assert_array_equal(out, 255)
    # straddling: top-left quadrant in, rest white
    out = native.wsi_patch_native(level, 4, 4, 4, 2)
    np.testing.assert_array_equal(out[:2, :2], 100)
    np.testing.assert_array_equal(out[2:, 2:], 255)
    # mixed 2x2 block: mean of (100, 255, 255, 255) floor-divided
    out = native.wsi_patch_native(level, 7, 7, 1, 2)
    assert int(out[0, 0, 0]) == (100 + 255 * 3) // 4
