"""PROX loader pure logic: point subsampling, RANSAC floor fit,
gender mapping."""

import os

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


def _write_fit_pkl(path, valid=True, betas_key="betas"):
    import pickle

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(abs(hash(path)) % (2**31))
    param = {
        "transl": rng.randn(1, 3).astype(np.float32),
        betas_key: rng.randn(1, 10).astype(np.float32) * 0.1,
        "body_pose": rng.randn(1, 63).astype(np.float32) * 0.1,
        "global_orient": rng.randn(1, 3).astype(np.float32) * 0.1,
    }
    if not valid:
        param["body_pose"][0, 5] = np.nan
    with open(path, "wb") as f:
        pickle.dump(param, f)
    return param


def test_read_fitting_seq_dummy_fill(tmp_path):
    """Reference read_fitting_seq (prox_dataset.py:52-89): missing files
    and non-finite fits become zero dummies with valid=False."""
    p_ok = str(tmp_path / "f0" / "000.pkl")
    p_nan = str(tmp_path / "f1" / "000.pkl")
    p_missing = str(tmp_path / "f2" / "000.pkl")
    ok = _write_fit_pkl(p_ok, valid=True)
    _write_fit_pkl(p_nan, valid=False)
    fits, valid = P.read_fitting_seq([p_ok, p_nan, p_missing],
                                     return_valid=True)
    assert valid == [True, False, False]
    assert fits["trans"].shape == (3, 3)
    assert fits["betas"].shape == (3, 10)
    assert fits["pose_body"].shape == (3, 63)
    np.testing.assert_allclose(fits["trans"][0], ok["transl"][0])
    assert np.isfinite(fits["pose_body"]).all()   # nan frame zero-filled
    np.testing.assert_allclose(fits["pose_body"][1], 0.0)
    np.testing.assert_allclose(fits["trans"][2], 0.0)
    # 'beta' naming variant (qualitative data)
    p_beta = str(tmp_path / "f3" / "000.pkl")
    _write_fit_pkl(p_beta, betas_key="beta")
    fits2 = P.read_fitting_seq([p_beta])
    assert fits2["betas"].shape == (1, 10)


def _make_prox_layout(root, rec="N3Office_00034_01", n_frames=8):
    import json

    rec_dir = os.path.join(root, "recordings", rec)
    kp_dir = os.path.join(rec_dir, "keypoints")
    os.makedirs(kp_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        name = f"s001_frame_{i:05d}"
        body = [{"pose_keypoints_2d":
                 rng.rand(25 * 3).astype(float).tolist()}]
        with open(os.path.join(kp_dir, name + "_keypoints.json"),
                  "w") as f:
            json.dump({"people": body}, f)
        # pseudo-GT fit for even frames only (odd = missing -> dummy)
        if i % 2 == 0:
            _write_fit_pkl(os.path.join(root, "fittings", "mosh", rec,
                                        "results", name, "000.pkl"))
    return rec_dir


def test_prox_fitting_batch_windows(tmp_path):
    rec_dir = _make_prox_layout(str(tmp_path), n_frames=8)
    ds = P.ProxDataset(rec_dir, str(tmp_path / "nocalib"),
                       P.ProxConfig(seq_len=6, overlap_len=2,
                                    use_depth=False, load_fitting=True))
    gt = ds.fitting_batch()
    assert gt is not None
    B = len(ds.intervals)
    assert gt["trans"].shape == (B, 6, 3)
    assert gt["betas"].shape == (B, 6, 10)
    assert gt["valid"].shape == (B, 6)
    # even global frames have fits, odd are dummy-filled
    s0 = ds.intervals[0][0]
    expect = [(s0 + t) % 2 == 0 for t in range(6)]
    np.testing.assert_array_equal(gt["valid"][0], expect)
    np.testing.assert_allclose(gt["trans"][0][~gt["valid"][0]], 0.0)


def test_prox_pseudo_gt_eval_chain(tmp_path):
    """Full chain: pseudo-GT saved as gt_results.npz -> `--mode prox`
    eval produces joint errors vs the pseudo-GT + plausibility
    (reference eval_fitting_2d.py PROXD comparison)."""
    import jax.numpy as jnp

    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.eval.fitting_cli import evaluate_stage

    body = synthetic_smpl_model()
    rng = np.random.RandomState(2)
    T = 5
    gt = {
        "trans": rng.randn(T, 3).astype(np.float32),
        "root_orient": (rng.randn(T, 3) * 0.2).astype(np.float32),
        "pose_body": (rng.randn(T, 63) * 0.1).astype(np.float32),
        "betas": (rng.randn(T, 10) * 0.1).astype(np.float32),
        "valid": np.asarray([True, True, False, True, True]),
    }
    d = tmp_path / "seq_000"
    d.mkdir()
    # prediction = the pseudo-GT params (16-beta zero pad) -> near-zero
    # joint error on valid frames
    betas16 = np.zeros((16,), np.float32)
    np.savez(d / "final_results.npz", trans=gt["trans"],
             root_orient=gt["root_orient"], pose_body=gt["pose_body"],
             betas=betas16)
    np.savez(d / "observations.npz", joints2d=rng.randn(T, 25, 3))
    gt_save = dict(gt)
    gt_save["betas"] = np.zeros((T, 10), np.float32)  # match pred betas
    np.savez(d / "gt_results.npz", **gt_save)
    table = evaluate_stage("final", [str(d)], body, mode="prox")
    assert "joints3d_all" in table
    assert table["joints3d_all"]["mean"] < 1e-4
    assert "joints3d_align_all" in table
    assert "accel_mag" in table
