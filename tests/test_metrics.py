"""Metric-math unit tests with analytic golden values (the reference
delegates to an external package and tests none of this)."""

import numpy as np
import pytest

from dcvgan_tpu.eval.metrics import (
    frechet_distance,
    inception_score,
    prd_curve,
    prd_f_beta,
)


def test_inception_score_uniform_is_one():
    probs = np.full((100, 10), 0.1)
    assert inception_score(probs) == pytest.approx(1.0, abs=1e-6)


def test_inception_score_onehot_is_k():
    # deterministic classifier uniformly covering K classes: IS = K
    k = 10
    probs = np.eye(k)[np.arange(200) % k]
    assert inception_score(probs) == pytest.approx(k, rel=1e-6)


def test_inception_score_collapsed_is_one():
    probs = np.zeros((100, 10))
    probs[:, 3] = 1.0
    assert inception_score(probs) == pytest.approx(1.0, abs=1e-4)


def test_fid_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    assert frechet_distance(f, f.copy()) == pytest.approx(0.0, abs=1e-6)


def test_fid_mean_shift_analytic():
    # For equal covariances, FID = ||mu1 - mu2||^2. Use large N to pin cov.
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(20000, 4))
    shift = np.array([1.0, 0.0, 0.0, 0.0])
    f2 = rng.normal(size=(20000, 4)) + shift
    assert frechet_distance(f1, f2) == pytest.approx(1.0, abs=0.05)


def test_fid_symmetry():
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(300, 8))
    f2 = 2 * rng.normal(size=(300, 8)) + 1
    assert frechet_distance(f1, f2) == pytest.approx(
        frechet_distance(f2, f1), rel=1e-8
    )


def test_prd_identical_high_f():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(400, 8))
    prec, rec = prd_curve(f, f.copy(), num_clusters=10)
    f8, f1_8 = prd_f_beta(prec, rec)
    assert f8 > 0.95 and f1_8 > 0.95


def test_prd_disjoint_low_f():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(300, 8))
    f2 = rng.normal(size=(300, 8)) + 50.0
    prec, rec = prd_curve(f1, f2, num_clusters=10)
    f8, f1_8 = prd_f_beta(prec, rec)
    assert f8 < 0.1 and f1_8 < 0.1


def test_prd_curve_bounds():
    rng = np.random.default_rng(2)
    prec, rec = prd_curve(
        rng.normal(size=(200, 4)), rng.normal(size=(200, 4)) + 1.0
    )
    assert np.all(prec >= 0) and np.all(prec <= 1)
    assert np.all(rec >= 0) and np.all(rec <= 1)


def test_feature_extractor_shapes():
    from dcvgan_tpu.eval.features import FeatureExtractor

    ex = FeatureExtractor(seed=0)
    vids = np.random.default_rng(0).integers(
        0, 255, (4, 16, 64, 64, 3), dtype=np.uint8
    )
    feats, probs = ex(vids, batchsize=2)
    assert feats.shape == (4, 512)
    assert probs.shape == (4, 101)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # deterministic across instances with same seed
    feats2, _ = FeatureExtractor(seed=0)(vids, batchsize=4)
    np.testing.assert_allclose(feats, feats2, rtol=1e-5)
