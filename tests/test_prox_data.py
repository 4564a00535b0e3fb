"""PROX loader pure logic: point subsampling, RANSAC floor fit,
gender mapping."""

import numpy as np

from humor_tpu.data import prox as P


def test_subsample_points_over():
    pts = np.random.RandomState(0).randn(5000, 3).astype(np.float32)
    out = P.subsample_points(pts, 1024)
    assert out.shape == (1024, 3)
    assert np.isfinite(out).all()


def test_subsample_points_under_pads_inf():
    pts = np.ones((10, 3), np.float32)
    out = P.subsample_points(pts, 64)
    assert np.isfinite(out[:10]).all()
    assert np.isinf(out[10:]).all()


def test_subsample_points_empty():
    out = P.subsample_points(np.zeros((0, 3), np.float32), 16)
    assert np.isinf(out).all()


def test_ransac_floor():
    rng = np.random.RandomState(1)
    # floor y = 2 in camera coords (plane -y = -2), plus outliers
    floor = rng.rand(500, 3).astype(np.float64) * 4
    floor[:, 1] = 2.0 + rng.randn(500) * 0.01
    outliers = rng.rand(100, 3) * 4
    plane = P.fit_floor_ransac(np.concatenate([floor, outliers]), seed=0)
    # normal should be close to -y (flipped up), offset ~ -2
    assert plane[1] < -0.99
    np.testing.assert_allclose(plane[3], -2.0, atol=0.05)


def test_gender_of_subject():
    assert P.gender_of_subject(162) == "female"
    assert P.gender_of_subject(1) == "male"
