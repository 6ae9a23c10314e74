"""Serving-mode quality budget, bounded in CI at toy scale (VERDICT r2 task 2).

`tools/deepcache_quality.py` prices the DeepCache serving mode on a trained
tiny model in relative FID (the BASELINE.json acceptance metric class); this
test runs the same train -> generate -> FID pipeline at toy scale and bounds
the cached-vs-exact degradation so the pricing pipeline itself is regression
-covered. Full-scale numbers (400 train steps, 256 samples, DDIM-50) live in
BASELINE.md's serving-quality table.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.deepcache_quality import build_tiny, evaluate, train_tiny  # noqa: E402


@pytest.mark.slow
@pytest.mark.skipif(not __import__("os").environ.get("STEDM_RUN_SLOW"),
                    reason="trains a tiny model (~minutes); set STEDM_RUN_SLOW=1")
def test_serving_mode_fid_delta_bounded():
    model = build_tiny()
    state, schedule = train_tiny(model, 150, log=lambda *a: None)
    results = evaluate(model, schedule, state.params, intervals=[3],
                       ddim_steps=20, fid_samples=64, log=lambda *a: None)
    exact_fid = results[1]["fid_rp"]
    cached = results[3]
    assert np.isfinite(cached["fid_rp"]) and np.isfinite(cached["rel_rms"])
    # the cached trajectory deviates per-pixel but must stay distributionally
    # close to the exact sampler: at most a bounded multiple of the exact
    # sampler's own FID-to-real (generous: 64-sample FID_rp is noisy)
    assert cached["fid_rp"] < 4.0 * exact_fid + 25.0, results
    # and the trajectory really is an approximation, not identical
    assert cached["rel_rms"] > 0.0


def test_fid_rp_separates_distributions():
    """Cheap non-slow guard: the featurizer-based FID used for the pricing
    distinguishes matched from mismatched image sets."""
    from tools.deepcache_quality import fid_rp, real_set

    a = real_set(128, seed=5000)
    b = real_set(128, seed=9000)         # same distribution, fresh draws
    # structured corruption (contrast collapse + brightness drift) — the kind
    # of artifact feature caching can introduce; high-frequency pixel noise is
    # deliberately NOT the probe (the featurizer spatially averages it away)
    c = np.clip(a * 0.5 - 0.3, -1, 1)
    same = fid_rp(a, b)
    far = fid_rp(a, c)
    assert far > 3.0 * same, (same, far)
