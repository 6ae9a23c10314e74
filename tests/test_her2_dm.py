"""HER2 DataModule-level integration: pickled ROI lists + ArraySlide-backed WSIs
through the composed config, fold splitting, and the train/val loaders."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from stedm_tpu.config import compose
from stedm_tpu.data.dm import DataModule
from stedm_tpu.data.wsi import block_reduce_median

CONF = Path(__file__).resolve().parents[1] / "configs"


@pytest.fixture(scope="module")
def her2_tree(tmp_path_factory):
    import cv2

    data_dir = tmp_path_factory.mktemp("her2data")
    base = data_dir / "her2_anno_her2_anno"  # zip_name = name + annotator name
    wsi_dir = base / "wsi"
    wsi_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)

    def roi(wsi_num):
        slide_img = rng.integers(30, 220, (256, 256, 3), dtype=np.uint8)
        name = f"slide_{wsi_num}.png"
        cv2.imwrite(str(wsi_dir / name), slide_img)
        seg = np.zeros((256, 256), np.uint8)
        seg[64:192, 64:192] = 2
        samp = block_reduce_median(seg, 8)
        return (name, (0, 0), cv2.imencode(".png", seg)[1],
                cv2.imencode(".png", samp)[1], wsi_num)

    train_val = [roi(101), roi(102)]
    test = [roi(103)]
    with open(base / "train_val.pkl", "wb") as f:
        pickle.dump(train_val, f)
    with open(base / "test.pkl", "wb") as f:
        pickle.dump(test, f)
    return data_dir


def test_her2_datamodule_end_to_end(her2_tree):
    cfg = compose("config_diff", [
        "data=her2",
        "data.patch_size=32", "data.samples=4", "data.batch_size=2",
        "data.base_scale=2", "data.lookup_f=8", "data.overlap_val=4",
        "data.class_train_samples=1",
        "location=pc", f"location.data_dir={her2_tree}",
        "location.n_workers=2",
        "style_sampling=nearby",
        "data.dataset.her2_anno.score_dict={101: 0, 102: 0, 103: 1}",
        "data.dataset.her2_anno.folds=[[102]]",
    ], config_dir=CONF)
    dm = DataModule(cfg)
    dm.setup()

    anno = dm.data_modules["her2_anno"]
    # fold 102 goes to val; 101 stays in train (score bin 0, first 12 kept)
    assert len(anno._list_val) == 1 and anno._list_val[0][-1] == 102
    assert [el[-1] for el in anno._list_train] == [101]

    img, one_hot, seg, style = next(iter(dm.train_loader()))[:4]
    assert img.shape == (2, 32, 32, 3)
    assert one_hot.shape == (2, 32, 32, 6)
    assert style.shape == (2, 1, 32, 32, 3)
    assert -1.0 <= img.min() and img.max() <= 1.0

    val_batch = next(iter(dm.val_loader()))
    v_img, _v_oh, v_seg, v_cuts, v_wsi = val_batch[:5]
    assert v_img.shape[1:] == (32, 32, 3)
    assert set(np.asarray(v_wsi).tolist()) == {0}

    # test list flows through the eval key path
    assert len(anno._list_test) == 1 and anno._list_test[0][-1] == 103
