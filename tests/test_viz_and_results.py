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


def test_stitch_windows():
    B, T = 3, 10
    # windows [0,10), [8,18), [16,26) with 2-frame overlaps
    iv = np.asarray([[0, 10], [8, 18], [16, 26]])
    trans = np.zeros((B, T, 3))
    for b in range(B):
        trans[b, :, 0] = np.arange(iv[b, 0], iv[b, 1])  # global frame idx
    betas = np.tile(np.arange(16, dtype=np.float64), (B, 1))
    out = R.stitch_windows({"trans": trans, "betas": betas}, iv)
    assert out["trans"].shape == (26, 3)
    # every output frame carries its own global index (later window wins
    # in overlaps but values agree here by construction)
    np.testing.assert_allclose(out["trans"][:, 0], np.arange(26))
    np.testing.assert_allclose(out["betas"], np.arange(16))
