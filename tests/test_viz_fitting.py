"""RGB overlay viz: projection + overlay rendering."""

import os

import numpy as np

from humor_tpu.viz import fitting as VF


def test_project_to_image():
    pts = np.asarray([[[0.0, 0.0, 2.0], [1.0, 0.5, 2.0]]])
    uv = VF.project_to_image(pts, (500.0, 500.0), (320.0, 240.0))
    np.testing.assert_allclose(uv[0, 0], [320.0, 240.0])
    np.testing.assert_allclose(uv[0, 1], [570.0, 365.0])


def test_overlay_frames(tmp_path):
    rng = np.random.RandomState(0)
    joints = rng.randn(3, 22, 3).astype(np.float32) * 0.3
    joints[..., 2] += 3.0
    obs = np.concatenate(
        [rng.rand(3, 25, 2) * 500 + 200, np.ones((3, 25, 1))], axis=-1)
    paths = VF.overlay_skeleton_frames(
        joints, (500.0, 500.0), (960.0, 540.0), str(tmp_path),
        joints2d_obs=obs, make_video=False)
    assert len(paths) == 3
    assert all(os.path.getsize(p) > 1000 for p in paths)
