"""End-to-end fitting-CLI wiring: drive `fitting/cli.py main()` through
dataset construction -> fused fit -> per-stage saves -> stitching ->
prior-frame npz -> eval CSVs, on synthetic on-disk layouts.

Every piece is unit-tested elsewhere; this pins the FLAGSHIP USER ENTRY's
wiring (flag plumbing, npz key contracts between the saver and the eval
loaders) so a regression can't ship silently (reference
run_fitting.py:38-453 is the behavioral target).

Budgets are minimal (2 L-BFGS iterations/stage, tiny windows): the test
asserts files, shapes, and loader round-trips — accuracy bounds live in
test_tto_accuracy.py.
"""

import json
import os

import numpy as np
import pytest


def _write_keypoints(dirpath, t, kp):
    data = {"people": [{"pose_keypoints_2d": kp.reshape(-1).tolist()}]}
    with open(os.path.join(dirpath, f"frame_{t:06d}_keypoints.json"),
              "w") as f:
        json.dump(data, f)


@pytest.fixture()
def rgb_layout(tmp_path):
    """Synthetic on-disk RGB video layout: OpenPose keypoint JSONs with
    smoothly-moving plausible detections + a pinhole intrinsics json."""
    kp_dir = tmp_path / "video_kps"
    kp_dir.mkdir()
    rng = np.random.RandomState(0)
    base = rng.rand(25, 2).astype(np.float32) * np.asarray([200.0, 150.0])
    base += np.asarray([220.0, 160.0], np.float32)
    n = 10
    for t in range(n):
        kp = np.concatenate(
            [base + np.sin(t / 3.0) * 5.0
             + rng.randn(25, 2).astype(np.float32),
             np.full((25, 1), 0.9, np.float32)], axis=-1)
        _write_keypoints(str(kp_dir), t, kp)
    intr = tmp_path / "intrinsics.json"
    with open(intr, "w") as f:
        json.dump([[300.0, 0.0, 320.0], [0.0, 300.0, 240.0],
                   [0.0, 0.0, 1.0]], f)
    return str(kp_dir), str(intr), n


def test_rgb_cli_end_to_end(rgb_layout, tmp_path):
    from humor_tpu.eval import fitting_cli as FE
    from humor_tpu.fitting import cli as FC

    kp_dir, intr, n = rgb_layout
    out = str(tmp_path / "fit_out")
    argv = [
        "--data-path", kp_dir,
        "--data-type", "RGB",
        "--seq-len", "6", "--overlap-len", "2",
        "--rgb-intrinsics", intr,
        "--num-iters", "2", "2", "2", "--num-iters-scale", "1",
        "--stage3-tune-init-num-frames", "3",
        "--stage3-freeze-start", "1", "--stage3-freeze-end", "2",
        "--lbfgs-candidates", "4",
        "--out", out, "--save-stages-results",
    ]
    res = FC.main(argv)

    # windows of a 10-frame video at seq_len 6 / overlap 2
    B, T = np.asarray(res.final["trans"]).shape[:2]
    assert T == 6 and B >= 2

    # per-window saves: final + all three stages + prior-frame variants
    for b in range(B):
        d = os.path.join(out, f"seq_{b:03d}")
        final = dict(np.load(os.path.join(d, "final_results.npz")))
        assert final["trans"].shape == (T, 3)
        assert final["root_orient"].shape == (T, 3)
        assert final["pose_body"].shape == (T, 63)
        assert final["betas"].shape[-1] == 16
        assert "floor_plane" in final
        for st in ("stage1", "stage2", "stage3"):
            s = dict(np.load(os.path.join(d, f"{st}_results.npz")))
            assert s["trans"].shape == (T, 3), st
        prior = dict(np.load(
            os.path.join(d, "final_results_prior.npz")))
        assert prior["trans"].shape == (T, 3)
        s2p = dict(np.load(
            os.path.join(d, "stage2_results_prior.npz")))
        assert s2p["trans"].shape == (T, 3)
        obs = dict(np.load(os.path.join(d, "observations.npz")))
        assert obs["joints2d"].shape == (T, 25, 3)

    # stitched full-video result covers every frame exactly once
    fr = os.path.join(out, "final_results")
    stitched = dict(np.load(os.path.join(fr, "stage3_results.npz")))
    assert stitched["trans"].shape == (n, 3)
    assert np.isfinite(stitched["trans"]).all()

    # the eval CLI consumes the directory this CLI wrote (2d mode needs
    # no GT: plausibility metrics only)
    eval_out = str(tmp_path / "fit_eval")
    table = FE.main(["--results", out, "--out", eval_out,
                     "--stages", "final,stage2", "--mode", "2d",
                     "--smplh-root", str(tmp_path / "nonexistent")])
    assert table
    csvs = [f for f in os.listdir(eval_out) if f.endswith(".csv")]
    assert csvs, os.listdir(eval_out)

    # the viz CLI consumes the same directory: stitched + per-window
    # overlays (+ prior-frame views, observed 2D keypoints)
    from humor_tpu.viz import fitting as VF

    viz_out = str(tmp_path / "fit_viz")
    written = VF.main(["--results", out, "--out", viz_out,
                       "--intrinsics", intr,
                       "--smplh-root", str(tmp_path / "nonexistent"),
                       "--viz-prior-frame", "--viz-obs-2d",
                       "--max-frames", "3",
                       "--render-width", "640", "--render-height", "480"])
    assert written and all(os.path.exists(p) for p in written)
    assert os.path.isdir(os.path.join(viz_out, "final_results"))
    assert os.path.isdir(os.path.join(viz_out, "final_results_prior"))
    assert os.path.isdir(os.path.join(viz_out, "seq_000"))
    # mesh renders happen alongside the skeleton overlays
    assert os.path.isdir(os.path.join(viz_out, "final_results", "mesh"))


def test_amass_cli_end_to_end(tmp_path):
    from humor_tpu.eval import fitting_cli as FE
    from humor_tpu.fitting import cli as FC

    out = str(tmp_path / "amass_out")
    argv = [
        "--data-path", str(tmp_path / "no_data_here"),  # -> synthetic
        "--data-type", "AMASS",
        "--batch-size", "8", "--seq-len", "6",
        "--amass-noise-std", "0.01",
        "--num-iters", "2", "2", "2", "--num-iters-scale", "1",
        "--stage3-tune-init-num-frames", "3",
        "--stage3-freeze-start", "1", "--stage3-freeze-end", "2",
        "--lbfgs-candidates", "4",
        "--out", out, "--save-stages-results",
    ]
    table = FC.main(argv)
    # the CLI's own quant eval aggregated across sequences
    assert "joints3d_all" in table
    assert os.path.exists(os.path.join(out, "eval_mean.csv"))

    seq_dirs = sorted(d for d in os.listdir(out)
                      if os.path.isdir(os.path.join(out, d)))
    assert len(seq_dirs) == 8
    d0 = os.path.join(out, seq_dirs[0])
    final = dict(np.load(os.path.join(d0, "final_results.npz")))
    assert final["trans"].shape == (6, 3)
    gt = dict(np.load(os.path.join(d0, "gt_results.npz")))
    assert gt["joints3d"].shape[0] == 6
    obs = dict(np.load(os.path.join(d0, "observations.npz")))
    assert np.isfinite(obs["joints3d"]).any()

    # 3D eval over the saved GT: the full metric CSV chain
    eval_out = str(tmp_path / "amass_eval")
    table = FE.main(["--results", out, "--out", eval_out,
                     "--stages", "final,stage2,stage3", "--mode", "3d",
                     "--smplh-root", str(tmp_path / "nonexistent")])
    assert table
    assert os.path.exists(os.path.join(eval_out, "compare_mean.csv"))
