"""Viz (matplotlib skeleton renderer, gif, OBJ export) and fitting
result I/O (stage saves, window stitching)."""

import os

import numpy as np
import pytest

from humor_tpu.fitting import results as R
from humor_tpu.viz import utils as V


def _joints_seq(T=4):
    rng = np.random.RandomState(0)
    base = rng.randn(22, 3).astype(np.float32) * 0.2
    base[:, 2] += 1.0
    return base[None] + rng.randn(T, 1, 3).astype(np.float32) * 0.05


def test_render_and_gif(tmp_path):
    seq = _joints_seq()
    frames = V.render_joint_seq(seq, str(tmp_path))
    assert len(frames) == 4
    assert all(os.path.getsize(f) > 1000 for f in frames)
    gif = V.create_gif(frames, str(tmp_path / "out.gif"), fps=10)
    assert os.path.getsize(gif) > 1000


def test_comparison_render(tmp_path):
    a, b = _joints_seq(2), _joints_seq(2) + 0.1
    frames = V.render_comparison_seq([a, b], ["pred", "gt"], str(tmp_path))
    assert len(frames) == 2


def test_export_obj(tmp_path):
    verts = np.random.RandomState(1).randn(10, 3)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]])
    path = V.export_obj(str(tmp_path / "m.obj"), verts, faces)
    lines = open(path).read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == 10
    assert sum(l.startswith("f ") for l in lines) == 2
    assert "f 1 2 3" in lines


def test_save_stage_results(tmp_path):
    B, T = 2, 5
    res = {
        "trans": np.random.randn(B, T, 3),
        "betas": np.random.randn(B, 16),
    }
    R.save_stage_results(str(tmp_path), "stage1", res)
    for b in range(B):
        f = np.load(tmp_path / f"seq_{b:03d}" / "stage1_results.npz")
        np.testing.assert_array_equal(f["trans"], res["trans"][b])
        np.testing.assert_array_equal(f["betas"], res["betas"][b])


def _reference_stitch(per_window, seq_intervals):
    """Numpy re-creation of the reference save_rgb_stitched_result concat
    loop (fitting_utils.py:398-475): each new window drops its first
    `overlap` frames; betas are per-frame-expanded then concatenated the
    same way; floor comes from the FIRST window."""
    overlaps = [0]
    for i in range(len(seq_intervals) - 1):
        overlaps.append(int(seq_intervals[i][1] - seq_intervals[i + 1][0]))
    out = {}
    for k in ("trans", "root_orient", "pose_body", "contacts"):
        if k not in per_window[0]:
            continue
        out[k] = np.concatenate(
            [w[k][overlaps[i]:] for i, w in enumerate(per_window)], axis=0)
    T = per_window[0]["trans"].shape[0]
    out["betas"] = np.concatenate(
        [np.tile(w["betas"][None], (T, 1))[overlaps[i]:]
         for i, w in enumerate(per_window)], axis=0)
    out["floor_plane"] = per_window[0]["floor_plane"]
    return out


def test_stitch_windows_matches_reference_algorithm():
    rng = np.random.RandomState(7)
    B, T = 3, 10
    # windows [0,10), [8,18), [16,26) with 2-frame overlaps
    iv = np.asarray([[0, 10], [8, 18], [16, 26]])
    res = {
        "trans": rng.randn(B, T, 3),
        "root_orient": rng.randn(B, T, 3),
        "pose_body": rng.randn(B, T, 63),
        "contacts": (rng.rand(B, T, 22) > 0.5).astype(np.float32),
        "betas": rng.randn(B, 16),
        "floor_plane": rng.randn(B, 3),
    }
    out = R.stitch_windows(res, iv)
    oracle = _reference_stitch(
        [{k: v[b] for k, v in res.items()} for b in range(B)], iv)
    assert out["trans"].shape == (26, 3)
    for k in oracle:
        np.testing.assert_allclose(out[k], oracle[k], err_msg=k)
    # overlap frames must come from the EARLIER window (reference
    # fitting_utils.py:434-436 drops the new window's first frames)
    np.testing.assert_allclose(out["trans"][8:10], res["trans"][0, 8:10])
    np.testing.assert_allclose(out["betas"][8:10], res["betas"][[0, 0]])


def test_stitch_observations():
    rng = np.random.RandomState(3)
    iv = np.asarray([[0, 6], [4, 10]])
    j2d = rng.randn(2, 6, 25, 3).astype(np.float32)
    out = R.stitch_observations({"joints2d": j2d}, iv)
    assert out["joints2d"].shape == (10, 25, 3)
    np.testing.assert_allclose(out["joints2d"][:6], j2d[0])
    np.testing.assert_allclose(out["joints2d"][6:], j2d[1, 2:])


def test_to_prior_frame_floor_aligned():
    """The prior-frame sequence must be z-up with the key-frame root at
    x=y=0 and at its camera-frame height above the floor (the reference's
    cam2prior contract, fitting_utils.py:479-523)."""
    import jax.numpy as jnp

    from humor_tpu.body_model import smpl as smpl_lib
    from humor_tpu.fitting import geometry as geo

    body = smpl_lib.synthetic_smpl_model()
    rng = np.random.RandomState(11)
    T = 5
    stitched = {
        "trans": np.asarray([0.3, 1.2, 2.0], np.float32)[None].repeat(T, 0)
        + rng.randn(T, 3).astype(np.float32) * 0.05,
        "root_orient": np.tile(np.asarray([np.pi, 0, 0], np.float32),
                               (T, 1)),
        "pose_body": rng.randn(T, 63).astype(np.float32) * 0.05,
        "betas": np.zeros((T, 16), np.float32),
        # camera-frame floor 1.5m below the camera (+y is down), so
        # the plane y=+1.5 in n*d form with an up (-y) normal
        "floor_plane": np.asarray([0.0, 1.5, 0.0], np.float32),
    }
    prior = R.to_prior_frame(stitched, body)
    assert prior["trans"].shape == (T, 3)
    # key-frame root is centered on the floor origin
    np.testing.assert_allclose(prior["trans"][0, :2], 0.0, atol=1e-5)
    # and its z equals the camera-frame height above the plane
    j0 = smpl_lib.forward(
        body, jnp.asarray(stitched["root_orient"][:1]),
        jnp.asarray(stitched["pose_body"][:1]),
        jnp.asarray(stitched["betas"][:1]),
        jnp.asarray(stitched["trans"][:1]),
        vert_ids=np.zeros((0,), np.int32)).Jtr
    root_cam = np.asarray(j0)[0, 0]
    expect_h = 1.5 - root_cam[1]   # distance above y=1.5 plane
    root_prior = smpl_lib.forward(
        body, jnp.asarray(prior["root_orient"][:1]),
        jnp.asarray(prior["pose_body"][:1]),
        jnp.asarray(stitched["betas"][:1]),
        jnp.asarray(prior["trans"][:1]),
        vert_ids=np.zeros((0,), np.int32)).Jtr
    np.testing.assert_allclose(np.asarray(root_prior)[0, 0, 2], expect_h,
                               atol=1e-4)
    # pose/betas unchanged (reference :505-510)
    np.testing.assert_allclose(prior["pose_body"], stitched["pose_body"])
    # relative root-to-root distances are preserved (rigid transform)
    d_cam = np.linalg.norm(np.diff(stitched["trans"], axis=0), axis=-1)
    d_pri = np.linalg.norm(np.diff(prior["trans"], axis=0), axis=-1)
    np.testing.assert_allclose(d_cam, d_pri, atol=1e-5)


def test_save_stitched_result(tmp_path):
    from humor_tpu.body_model import smpl as smpl_lib

    body = smpl_lib.synthetic_smpl_model()
    rng = np.random.RandomState(5)
    B, T = 2, 6
    iv = np.asarray([[0, 6], [4, 10]])
    final = {
        "trans": rng.randn(B, T, 3).astype(np.float32),
        "root_orient": np.tile(np.asarray([np.pi, 0, 0], np.float32),
                               (B, T, 1)),
        "pose_body": rng.randn(B, T, 63).astype(np.float32) * 0.05,
        "betas": np.zeros((B, 16), np.float32),
        "floor_plane": np.tile(np.asarray([0, 1.0, 0], np.float32),
                               (B, 1)),
        "contacts": (rng.rand(B, T, 22) > 0.5).astype(np.float32),
    }
    observed = {
        "joints2d": rng.randn(B, T, 25, 3).astype(np.float32),
        "seq_interval": iv,
    }
    stitched = R.save_stitched_result(str(tmp_path), final, observed, body)
    assert stitched["trans"].shape == (10, 3)
    fr = tmp_path / "final_results"
    res = np.load(fr / "stage3_results.npz")
    np.testing.assert_allclose(res["trans"], stitched["trans"])
    assert res["betas"].shape == (10, 16)
    obs = np.load(fr / "observations.npz")
    assert obs["joints2d"].shape == (10, 25, 3)
    prior = np.load(fr / "stage3_results_prior.npz")
    assert prior["trans"].shape == (10, 3)
    assert "floor_plane" not in prior
    assert prior["contacts"].shape == (10, 22)


def test_save_prior_stage_results(tmp_path):
    from humor_tpu.body_model import smpl as smpl_lib

    body = smpl_lib.synthetic_smpl_model()
    rng = np.random.RandomState(9)
    B, T = 2, 4
    res = {
        "trans": rng.randn(B, T, 3).astype(np.float32),
        "root_orient": np.tile(np.asarray([np.pi, 0, 0], np.float32),
                               (B, T, 1)),
        "pose_body": rng.randn(B, T, 63).astype(np.float32) * 0.05,
        "betas": np.zeros((B, 16), np.float32),
    }
    floor = np.tile(np.asarray([0, 1.2, 0], np.float32), (B, 1))
    R.save_prior_stage_results(str(tmp_path), "stage2", res, body, floor)
    for b in range(B):
        f = np.load(tmp_path / f"seq_{b:03d}" / "stage2_results_prior.npz")
        assert f["trans"].shape == (T, 3)
        np.testing.assert_allclose(f["pose_body"], res["pose_body"][b])
