"""FID math tests: analytic Gaussians and identical-set zero."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.fid import fid_from_features, frechet_distance  # noqa: E402


def test_identical_distributions_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    assert abs(fid_from_features(f, f)) < 1e-6


def test_mean_shift_analytic():
    """For equal covariances, FID == |mu1 - mu2|^2."""
    d = 8
    mu1, mu2 = np.zeros(d), np.full(d, 0.5)
    sigma = np.eye(d)
    got = frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(got, d * 0.25, rtol=1e-6)


def test_variance_mismatch_analytic():
    """Diagonal case: FID = sum (sqrt(s1) - sqrt(s2))^2."""
    d = 4
    s1 = np.diag([1.0, 1.0, 1.0, 1.0])
    s2 = np.diag([4.0, 4.0, 4.0, 4.0])
    got = frechet_distance(np.zeros(d), s1, np.zeros(d), s2)
    np.testing.assert_allclose(got, d * (2.0 - 1.0) ** 2, rtol=1e-6)


def test_sampled_gaussians_close_to_analytic():
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(4000, 4))
    f2 = rng.normal(loc=1.0, size=(4000, 4))
    got = fid_from_features(f1, f2)
    assert abs(got - 4.0) < 0.3
