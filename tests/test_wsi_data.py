"""WSI data-layer tests: slide reader, patch handler, consensus, HER2/CATCH
datasets over the ArraySlide backend with generated fixtures."""

import pickle
import zipfile  # noqa: F401  (documents the zip staging path under test)

import numpy as np
import pytest

from stedm_tpu.config import Config
from stedm_tpu.data.prep import consensus_stack, rasterize_rois
from stedm_tpu.data.wsi import (
    ArraySlide,
    block_reduce_median,
    downscale_local_mean,
    tissue_mask,
    wsi_sample,
)
from stedm_tpu.utils.patch_handler import PatchHandlerMS


def test_downscale_local_mean_matches_block_mean():
    x = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = downscale_local_mean(x, (2, 2))
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])
    # padding with cval
    out = downscale_local_mean(np.ones((3, 3)), (2, 2), cval=0)
    assert out.shape == (2, 2)


def test_block_reduce_median():
    x = np.array([[1, 1, 2, 2], [1, 5, 2, 8], [3, 3, 4, 4], [3, 9, 4, 9]],
                 dtype=np.uint8)
    out = block_reduce_median(x, 2)
    np.testing.assert_array_equal(out, [[1, 2], [3, 4]])


def test_array_slide_read_region_and_pyramid():
    base = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    slide = ArraySlide(base, levels=3)
    assert slide.dimensions == (64, 64)
    assert slide.level_downsamples == [1.0, 2.0, 4.0]
    region = slide.read_region((8, 4), 0, (16, 16))
    assert region.shape == (16, 16, 4)
    np.testing.assert_array_equal(region[:, :, :3], base[4:20, 8:24])
    # out-of-bounds reads are alpha-0
    region = slide.read_region((-8, -8), 0, (16, 16))
    assert region[0, 0, 3] == 0 and region[10, 10, 3] == 255


def test_wsi_sample_levels_and_alpha_fill():
    base = np.full((64, 64, 3), 100, dtype=np.uint8)
    slide = ArraySlide(base, levels=3)
    # matching pyramid level (b_scale=2)
    crop = wsi_sample(slide, (0, 0), 16, 2, (32, 32))
    assert crop.shape == (16, 16, 3)
    np.testing.assert_array_equal(crop, np.full((16, 16, 3), 100))
    # b_scale=8 not in pyramid -> read level 4x and downscale 2x
    crop = wsi_sample(slide, (0, 0), 8, 8, (32, 32))
    assert crop.shape == (8, 8, 3)
    # out-of-bounds fills white
    crop = wsi_sample(slide, (0, 0), 16, 2, (0, 0))
    assert crop[0, 0, 0] == 255


def test_wsi_sample_async_matches_sync():
    """wsi_sample_async (VERDICT r4 task 5: per-sample reads through the C++
    pool) must return byte-identical patches to wsi_sample, on both the native
    -pool path and the synchronous fallback."""
    from stedm_tpu.data.wsi import wsi_sample_async

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    slide = ArraySlide(base, levels=3)
    for p_size, b_scale, pos in [(16, 2, (32, 40)), (8, 8, (32, 32)),
                                 (16, 2, (0, 0)), (12, 1, (90, 90))]:
        want = wsi_sample(slide, (3, 5), p_size, b_scale, pos)
        got = wsi_sample_async(slide, (3, 5), p_size, b_scale, pos).get()
        np.testing.assert_array_equal(got, want)

    # fallback path: force the pool away
    import stedm_tpu.data.wsi as wsi_mod
    import stedm_tpu.data.native_pipeline as npipe
    orig = npipe.global_pipeline
    npipe.global_pipeline = lambda: None
    try:
        got = wsi_sample_async(slide, (3, 5), 16, 2, (32, 40)).get()
    finally:
        npipe.global_pipeline = orig
    np.testing.assert_array_equal(got, wsi_sample(slide, (3, 5), 16, 2, (32, 40)))


def test_patch_handler_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 130, 3), dtype=np.uint8)
    ph = PatchHandlerMS(img.shape, patch_size=48, overlap=8)
    for idx in range(ph.num_segs()):
        patch = ph.get(img, idx, 1)
        assert patch.shape == (48, 48, 3)
        ph.take(patch, idx)
    np.testing.assert_array_equal(ph.get_out_image(), img)


def _consensus_scalar(values: np.ndarray) -> tuple[int, int]:
    """Independent scalar oracle of the reference numba kernel
    (her2_utils.py:87-130)."""
    mod = np.zeros_like(values)
    mod[(values >= 1) & (values <= 4)] = 1
    mod[values == 5] = 2
    first = int(np.ceil(np.median(mod)))
    if first == 0:
        bg, hn = int((values == 0).sum()), int((values == 6).sum())
        return (6 if hn >= bg else 0), bg + hn
    if first == 1:
        reg = values[(values >= 1) & (values <= 4)]
        v = int(np.ceil(np.median(reg)))
        return v, int((reg == v).sum())
    return 5, int((values == 5).sum())


def test_consensus_stack_matches_scalar_oracle():
    rng = np.random.default_rng(3)
    stack = rng.integers(0, 7, (5, 13, 11)).astype(np.uint8)
    value, strength = consensus_stack(stack)
    for j in range(stack.shape[1]):
        for i in range(stack.shape[2]):
            v, s = _consensus_scalar(stack[:, j, i])
            assert value[j, i] == v, (j, i, stack[:, j, i])
            assert strength[j, i] == s, (j, i, stack[:, j, i])


def test_rasterize_rois_shapes():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    tri = np.array([[10, 10], [60, 10], [10, 60]], dtype=np.float64)
    rois = [{"x1": 0, "y1": 0, "x2": 64, "y2": 64}]
    out = rasterize_rois(rois, [(tri, "Tumor")], {"Tumor": 2}, look_f=8,
                         path_name="slide_42.svs")
    (name, offset, seg_png, samp_png, num), = out
    assert num == 42 and offset == (0, 0)
    seg = cv2.imdecode(seg_png, cv2.IMREAD_ANYDEPTH)
    assert seg.shape == (64, 64) and set(np.unique(seg)) == {0, 2}


# ---- HER2 dataset over ArraySlide fixtures -----------------------------------


@pytest.fixture(scope="module")
def her2_fixture(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("her2")
    rng = np.random.default_rng(0)
    img_l = []
    for wsi_num in (101, 102):
        # a fake 256^2 "slide" saved as png (ArraySlide backend)
        slide_img = rng.integers(30, 220, (256, 256, 3), dtype=np.uint8)
        path = root / f"slide_{wsi_num}.png"
        cv2.imwrite(str(path), slide_img)
        # ROI segmentation at base scale over the whole slide
        seg = np.zeros((256, 256), np.uint8)
        seg[64:192, 64:192] = 2
        samp = block_reduce_median(seg, 8)
        seg_png = cv2.imencode(".png", seg)[1]
        samp_png = cv2.imencode(".png", samp)[1]
        img_l.append((str(path), (0, 0), seg_png, samp_png, wsi_num))
    return img_l


def test_her2_anno_dataset(her2_fixture):
    from stedm_tpu.data import augment
    from stedm_tpu.data.her2 import HER2_DS_Anno, NearbySampler

    cfg = Config.wrap({"relative_dist": 1})
    patch = 32
    sampler = NearbySampler(cfg, augment.style_transforms(patch))
    ds = HER2_DS_Anno(her2_fixture, samples=4, patch_size=patch, base_scale=2,
                      overlap=4, lookup_f=8, num_classes=6, style_sampler=sampler,
                      style_drop_rate=0.0, transforms=augment.base_transforms(patch),
                      rois_per_slide=1)
    img, one_hot, seg, style = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert img.shape == (patch, patch, 3) and img.min() >= -1 and img.max() <= 1
    assert one_hot.shape == (patch, patch, 6)
    assert seg.shape == (patch, patch) and set(np.unique(seg)) <= {0, 2}
    assert style.shape == (1, patch, patch, 3)


def test_her2_ordered_dataset(her2_fixture):
    from stedm_tpu.data import augment
    from stedm_tpu.data.her2 import HER2_DS_Ordered

    patch = 32
    ds = HER2_DS_Ordered(her2_fixture, patch_size=patch, base_scale=2, overlap=4,
                         num_classes=6, transforms=augment.eval_transforms(patch))
    assert len(ds) == ds._patcher.num_segs() * 2
    img, one_hot, seg, cuts, wsi = ds.__getitem__(len(ds) - 1)
    assert img.shape == (patch, patch, 3)
    assert wsi == 1  # second slide
    assert cuts[0] >= 0 and cuts[1] >= 0  # border patch has cut margins


def test_her2_unanno_dataset(her2_fixture):
    from stedm_tpu.data import augment
    from stedm_tpu.data.her2 import HER2_DS_UnAnno, MultiPatchSampler

    patch = 32
    cfg = Config.wrap({"num_patches": 3})
    sampler = MultiPatchSampler(cfg, augment.style_transforms(patch))
    rows = [{"File Path": her2_fixture[0][0], "HER2 Score": 2, "Slide ID": "A"}]
    ds = HER2_DS_UnAnno(rows, samples=2, patch_size=patch, base_scale=2, overlap=4,
                        num_classes=6, style_sampler=sampler,
                        transforms=augment.style_transforms(patch))
    img, one_hot, seg, style, inst = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert style.shape == (3, patch, patch, 3)
    assert np.all(seg == -1)
    assert inst == 0


# ---- CATCH dataset over h5 fixtures -------------------------------------------


def test_catch_anno_dataset(tmp_path):
    import cv2
    import h5py

    from stedm_tpu.data import augment
    from stedm_tpu.data.catch import CATCH_DS_Anno, MultiPatchSampler

    rng = np.random.default_rng(0)
    patch = 32
    slide_img = rng.integers(30, 220, (512, 512, 3), dtype=np.uint8)
    slide_path = tmp_path / "Melanoma_01.png"
    cv2.imwrite(str(slide_path), slide_img)

    seg = np.zeros((512, 512), np.uint8)
    seg[128:384, 128:384] = 3
    anno_path = tmp_path / "anno.hdf5"
    with h5py.File(anno_path, "w") as f:
        f.create_dataset("7", data=seg, chunks=(128, 128), compression="gzip")
    samp = block_reduce_median(seg, 32)
    samp_png = cv2.imencode(".png", samp)[1]
    img_l = [(str(slide_path), (0, 0), samp_png, 7)]

    cfg = Config.wrap({"num_patches": 2})
    sampler = MultiPatchSampler(cfg, augment.style_transforms(patch))
    ds = CATCH_DS_Anno(img_l, str(anno_path), patch, base_scale=2, overlap=4,
                       samples=4, lookup_f=32, num_classes=8, style_sampler=sampler,
                       style_drop_rate=0.0, transforms=augment.base_transforms(patch))
    img, one_hot, seg_out, style = ds.__getitem__(0, rng=np.random.default_rng(2))
    assert img.shape == (patch, patch, 3)
    assert one_hot.shape == (patch, patch, 8)
    assert style.shape == (2, patch, patch, 3)
    assert set(np.unique(seg_out)) <= {0, 3}
