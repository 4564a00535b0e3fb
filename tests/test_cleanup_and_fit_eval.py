"""Cleanup tool and fitting-eval CLI over a synthetic results dir."""

import os

import numpy as np
import pytest

from humor_tpu.data import cleanup_amass as CL


def test_cleanup_moves_bad_sequences(tmp_path):
    root = tmp_path / "amass"
    for rel in [
        "BioMotionLab_NTroje/rub001/treadmill_fast_poses.npz",
        "BioMotionLab_NTroje/rub001/walk_poses.npz",
        "MPI_HDM05/dg/HDM_dg_07-01_01_120_poses.npz",
        "CMU/01/01_01_poses.npz",
    ]:
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
    bad = CL.find_bad_sequences(str(root))
    assert len(bad) == 2
    moved = CL.cleanup(str(root))
    assert len(moved) == 2
    assert (root / "CMU/01/01_01_poses.npz").exists()
    assert not (root / "BioMotionLab_NTroje/rub001/"
                "treadmill_fast_poses.npz").exists()
    assert (root / "_removed/BioMotionLab_NTroje/rub001/"
            "treadmill_fast_poses.npz").exists()


def test_fitting_eval_cli(tmp_path):
    import jax.numpy as jnp

    from humor_tpu.body_model import constants as C
    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.eval.fitting_cli import evaluate_stage
    from humor_tpu.fitting.optimizer import smpl_results

    body = synthetic_smpl_model()
    rng = np.random.RandomState(0)
    T = 6
    trans = rng.randn(1, T, 3).astype(np.float32)
    root = (rng.randn(1, T, 3) * 0.2).astype(np.float32)
    pose = (rng.randn(1, T, 63) * 0.1).astype(np.float32)
    betas = np.zeros((1, 16), np.float32)
    gt_j = np.asarray(smpl_results(body, jnp.asarray(trans),
                                   jnp.asarray(root), jnp.asarray(pose),
                                   jnp.asarray(betas))["joints3d"][0])

    d = tmp_path / "seq_000"
    d.mkdir()
    np.savez(d / "final_results.npz", trans=trans[0], root_orient=root[0],
             pose_body=pose[0], betas=betas[0])
    np.savez(d / "observations.npz", joints3d=gt_j)
    np.savez(d / "gt_results.npz", joints3d=gt_j)

    table = evaluate_stage("final", [str(d)], body, mode="3d")
    # prediction == GT by construction -> zero error
    assert table["joints3d_all"]["mean"] < 1e-5
    assert "accel_mag" in table
    assert "ground_pen@0.00" in table

    # --qual rendering: one side-by-side comparison gif per sequence
    # (stage columns + GT; reference eval_fitting_3d.py --qual)
    from humor_tpu.eval.fitting_cli import render_qual
    gifs = render_qual(["final"], [str(d)], body, str(tmp_path / "ev"))
    assert len(gifs) == 1 and os.path.exists(gifs[0])
