"""Fitting-observation dataset: mesh-surface point sampling.

The reference samples the mesh SURFACE with trimesh
(/root/reference/humor/datasets/amass_fit_dataset.py:97-119); the numpy
barycentric equivalent must (a) place every sample exactly on a face and
(b) weight faces by area.
"""

import numpy as np

from humor_tpu.data.fit_dataset import (FitObsConfig, build_observations,
                                        sample_surface_points)


def _face_residuals(p, tri):
    """(P, 3) points vs one (3, 3) triangle -> (plane_dist, bary_ok)."""
    a, b, c = tri
    n = np.cross(b - a, c - a)
    n = n / np.linalg.norm(n)
    plane = np.abs((p - a) @ n)
    # barycentric solve in the triangle plane
    M = np.stack([b - a, c - a], axis=1)           # (3, 2)
    uv, *_ = np.linalg.lstsq(M, (p - a).T, rcond=None)
    u, v = uv
    bary_ok = (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1 + 1e-6)
    return plane, bary_ok


def test_samples_lie_on_faces():
    rng = np.random.RandomState(0)
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                       np.float64)
    faces = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]],
                       np.int32)
    pts = sample_surface_points(verts, faces, 256, rng)
    assert pts.shape == (256, 3)
    on_some_face = np.zeros(256, bool)
    for f in faces:
        plane, bary = _face_residuals(pts.astype(np.float64), verts[f])
        on_some_face |= (plane < 1e-5) & bary
    assert on_some_face.all()


def test_area_weighting():
    rng = np.random.RandomState(1)
    # two coplanar triangles, area ratio 9:1
    verts = np.asarray([[0, 0, 0], [3, 0, 0], [0, 3, 0],
                        [10, 0, 0], [11, 0, 0], [10, 1, 0]], np.float64)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    pts = sample_surface_points(verts, faces, 4000, rng)
    frac_big = float(np.mean(pts[:, 0] < 5.0))
    assert abs(frac_big - 0.9) < 0.03


def test_batched_leading_dims():
    rng = np.random.RandomState(2)
    verts = rng.randn(2, 3, 8, 3)
    faces = rng.randint(0, 8, size=(12, 3)).astype(np.int32)
    pts = sample_surface_points(verts, faces, 16, rng)
    assert pts.shape == (2, 3, 16, 3)
    assert np.isfinite(pts).all()


def test_build_observations_surface_points():
    rng = np.random.RandomState(3)
    B, T, V = 2, 4, 6
    world = {
        "trans": np.zeros((B, T, 3), np.float32),
        "root_orient": np.zeros((B, T, 9), np.float32),
        "pose_body": np.zeros((B, T, 63), np.float32),
        "joints": np.zeros((B, T, 66), np.float32),
    }
    body_verts = rng.randn(B, T, V, 3).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5], [0, 2, 4]], np.int32)
    cfg = FitObsConfig(seq_len=T, use_joints=False, use_points=True,
                       num_points=32)
    observed, _ = build_observations(cfg, world, rng,
                                     body_verts=body_verts,
                                     body_faces=faces)
    pts = observed["points3d"]
    assert pts.shape == (B, T, 32, 3)
    # samples stay inside each frame's vertex bounding box (convexity of
    # barycentric combinations)
    lo = body_verts.min(axis=2, keepdims=True) - 1e-4
    hi = body_verts.max(axis=2, keepdims=True) + 1e-4
    assert ((pts >= lo) & (pts <= hi)).all()
