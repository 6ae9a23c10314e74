"""Toy-scale CI run of the downstream-seg mIoU pricing pipeline.

The full experiment (tools/seg_quality.py, BASELINE.md round-4 table) prices
the serving frontier in the SECOND half of BASELINE.json's acceptance
criteria (downstream segmentation IoU, reference README.md:34-51 workflow).
This test runs the identical pipeline at toy scale: enough to prove the
plumbing (paired labeled sets, three training mixes, CM->IoU protocol from
reference modules/segmentation.py:135-160) end-to-end, not enough for the
IoU numbers themselves to be meaningful — those live in BASELINE.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.seg_quality import (  # noqa: E402
    generate_labeled_set,
    real_labeled_set,
    run_experiment,
    train_and_eval_seg,
)


@pytest.fixture(scope="module")
def experiment():
    return run_experiment(diff_steps=30, syn_samples=8, seg_steps=25, seeds=2,
                          patch=32, ddim_steps=4, schedule_spec="uniform:2",
                          cfg_interval=(0.2, 0.8), real_train=8,
                          val_samples=16, log=lambda *a: None)


def test_experiment_structure_and_ranges(experiment):
    out = experiment
    assert set(out["results"]) == {"real_only", "real+exact_syn",
                                   "real+cached_syn"}
    for mix, r in out["results"].items():
        assert len(r["miou"]) == 2  # per-seed values recorded
        for v in r["iou_fg"] + r["miou"]:
            assert 0.0 <= v <= 1.0, (mix, v)
    assert out["config"]["refresh_positions"][0] == 0
    assert out["config"]["cfg_interval"] == [0.2, 0.8]
    assert set(out["summary"]) == set(out["results"])
    for s in out["summary"].values():
        assert np.isfinite(s["miou_mean"]) and np.isfinite(s["miou_std"])


def test_labeled_sets_are_paired_and_typed():
    from tools.deepcache_quality import build_tiny, train_tiny

    model = build_tiny(32)
    state, schedule = train_tiny(model, 5, 32, log=lambda *a: None)
    exact_i, exact_s = generate_labeled_set(model, schedule, state.params,
                                            n=6, ddim_steps=4)
    cached_i, cached_s = generate_labeled_set(model, schedule, state.params,
                                              n=6, ddim_steps=4,
                                              positions=(0, 2))
    assert exact_i.shape == (6, 32, 32, 3) and exact_s.shape == (6, 32, 32)
    assert exact_s.dtype == np.int32 and set(np.unique(exact_s)) <= {0, 1}
    # same layout seeds -> identical labels; cached imgs differ from exact
    assert np.array_equal(exact_s, cached_s)
    assert not np.allclose(exact_i, cached_i)


def test_seg_training_learns_on_easy_real_data():
    # sanity: on the structured real distribution, even the tiny seg net at
    # short schedule must beat chance IoU on the fg class
    ti, ts = real_labeled_set(32, 32)
    vi, vs = real_labeled_set(16, 32, seed=9100)
    r = train_and_eval_seg(ti, ts, vi, vs, steps=60, seed=0)
    assert 0.0 <= r["iou_fg"] <= 1.0 and 0.0 <= r["miou"] <= 1.0
    assert r["miou"] > 0.3, r  # fg/bg colored blobs are nearly separable


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
