"""CATCH DataModule-level integration: split pickles + HDF5 annotation store +
ArraySlide WSIs through the composed config."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from stedm_tpu.config import compose
from stedm_tpu.data.dm import DataModule
from stedm_tpu.data.wsi import block_reduce_median

CONF = Path(__file__).resolve().parents[1] / "configs"


@pytest.fixture(scope="module")
def catch_tree(tmp_path_factory):
    import cv2
    import h5py

    data_dir = tmp_path_factory.mktemp("catchdata")
    base = data_dir / "catch_catch_anno"   # zip_name + annotator name
    wsi_dir = base / "wsi"
    wsi_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)

    lists = {"train": [], "val": [], "test": []}
    with h5py.File(base / "anno.hdf5", "w") as f:
        specs = [("Melanoma_01.png", 0, "train", 3), ("Histiocytoma_02.png", 1, "train", 7),
                 ("Melanoma_03.png", 2, "val", 3), ("SCC_04.png", 3, "test", 6)]
        for name, num, split, cls in specs:
            slide_img = rng.integers(30, 220, (512, 512, 3), dtype=np.uint8)
            cv2.imwrite(str(wsi_dir / name), slide_img)
            seg = np.zeros((512, 512), np.uint8)
            seg[128:384, 128:384] = cls
            f.create_dataset(str(num), data=seg, chunks=(128, 128),
                             compression="gzip")
            samp = block_reduce_median(seg, 8)
            samp_png = cv2.imencode(".png", samp)[1]
            lists[split].append((name, (0, 0), samp_png, num))
    for split, lst in lists.items():
        with open(base / f"{split}.pkl", "wb") as fh:
            pickle.dump(lst, fh)
    return data_dir


def test_catch_datamodule_end_to_end(catch_tree):
    cfg = compose("config_diff", [
        "data=catch",
        "data.patch_size=32", "data.samples=4", "data.batch_size=2",
        "data.base_scale=2", "data.lookup_f=8", "data.overlap_val=4",
        "data.class_train_samples=1",
        "location=pc", f"location.data_dir={catch_tree}", "location.n_workers=2",
        "style_sampling=mp", "style_sampling.num_patches=2",
    ], config_dir=CONF)
    dm = DataModule(cfg)
    dm.setup()

    anno = dm.data_modules["catch_anno"]
    # anno/unanno split keyed by subtype substring in the file name
    assert len(anno._list_train) == 2   # Melanoma_01 + Histiocytoma_02
    assert len(anno._list_val) == 1 and len(anno._list_test) == 1

    img, one_hot, seg, style = next(iter(dm.train_loader()))[:4]
    assert img.shape == (2, 32, 32, 3)
    assert one_hot.shape == (2, 32, 32, 8)
    assert style.shape == (2, 2, 32, 32, 3)   # mp sampler, 2 patches
    assert set(np.unique(seg)).issubset({0, 3, 7})

    val_batch = next(iter(dm.val_loader()))
    assert val_batch[0].shape[1:] == (32, 32, 3)
