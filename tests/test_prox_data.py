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


def test_ransac_floor_multi_plane_scene():
    """Floor + dominant wall + tabletop: the fit must return the FLOOR —
    justifying the direct-RANSAC simplification of the reference's
    RANSACRegressor+DBSCAN pipeline (prox_dataset.py:360-427), whose
    y=f(x,z) functional form cannot select a wall and whose lowest-
    cluster pick skips the tabletop."""
    rng = np.random.RandomState(1)
    # camera frame: +y down. Floor at y=2 (500 pts)
    floor = np.stack([rng.uniform(-3, 3, 500),
                      2.0 + rng.randn(500) * 0.01,
                      rng.uniform(0.5, 6, 500)], axis=1)
    # wall at z=6 with MORE points than the floor
    wall = np.stack([rng.uniform(-3, 3, 900),
                     rng.uniform(-1, 2, 900),
                     6.0 + rng.randn(900) * 0.01], axis=1)
    # tabletop at y=1.2 (horizontal but above the floor)
    table = np.stack([rng.uniform(-1, 1, 300),
                      1.2 + rng.randn(300) * 0.01,
                      rng.uniform(2, 4, 300)], axis=1)
    pts = np.concatenate([floor, wall, table]).astype(np.float64)
    plane = P.fit_floor_ransac(pts, n_iters=400, seed=0)
    np.testing.assert_allclose(plane[:3], [0.0, -1.0, 0.0], atol=0.03)
    np.testing.assert_allclose(plane[3], -2.0, atol=0.05)
