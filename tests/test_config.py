"""Config system: @file parsing, type handling, stage-weight mapping."""

import os

import pytest

from humor_tpu.fitting.energies import StageWeights
from humor_tpu.utils.config import (FitCLIConfig, TestCLIConfig,
                                    TrainCLIConfig, parse_into)


def test_parse_defaults():
    cfg = parse_into(TrainCLIConfig, [])
    assert cfg.batch_size == 200
    assert cfg.sched_milestones == (50, 80, 140)
    assert cfg.kl_loss == 0.0004


def test_parse_cli_overrides():
    cfg = parse_into(TrainCLIConfig,
                     ["--batch-size", "32", "--lr", "0.001",
                      "--sched-milestones", "10", "20",
                      "--no-use-smpl-losses"])
    assert cfg.batch_size == 32
    assert cfg.lr == 0.001
    assert cfg.sched_milestones == (10, 20)
    assert cfg.use_smpl_losses is False


def test_parse_from_cfg_file(tmp_path):
    f = tmp_path / "preset.cfg"
    f.write_text("# comment line\n--batch-size 8\n--epochs 3\n"
                 "--sched-decays 0.1 0.2\n")
    cfg = parse_into(TrainCLIConfig, [f"@{f}"])
    assert cfg.batch_size == 8
    assert cfg.epochs == 3
    assert cfg.sched_decays == (0.1, 0.2)


def test_repo_presets_parse():
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = parse_into(TrainCLIConfig, [f"@{root}/train_humor.cfg"])
    assert cfg.batch_size == 200 and cfg.epochs == 200
    fit = parse_into(FitCLIConfig, [f"@{root}/fit_amass_joints.cfg"])
    assert fit.seq_len == 60
    assert fit.num_iters == (30, 70, 70)
    t = parse_into(TestCLIConfig, [f"@{root}/test_humor_sampling.cfg"])
    assert t.eval_sampling and t.eval_sampling_len == 10.0


def test_every_shipped_preset_parses():
    """Every .cfg under configs/ parses into its CLI config class and its
    derived pipeline objects construct (reference ships 17 presets +
    intrinsics json under /root/reference/configs/)."""
    import glob
    import json

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cls_for = {"train": TrainCLIConfig, "test": TestCLIConfig,
               "fit": FitCLIConfig}
    presets = sorted(glob.glob(os.path.join(root, "*.cfg")))
    assert len(presets) >= 14, presets
    for path in presets:
        kind = os.path.basename(path).split("_")[0]
        cfg = parse_into(cls_for[kind], [f"@{path}"])
        if kind == "fit":
            w = cfg.stage_weights()
            assert len(w) == 3
            assert any(getattr(w[0], f) > 0
                       for f in ("joints3d", "verts3d", "points3d",
                                 "joints2d")), path
        elif kind == "train":
            assert cfg.epochs > 0 and cfg.batch_size > 0
        else:
            assert cfg.eval_test or cfg.eval_sampling or cfg.eval_recon, path

    # qual presets carry the SMPL-joint-feedback switch
    q = parse_into(TrainCLIConfig, [f"@{root}/train_humor_qual.cfg"])
    assert q.model_use_smpl_joint_inputs
    tq = parse_into(TestCLIConfig, [f"@{root}/test_humor_qual.cfg"])
    assert tq.eval_test and tq.qual

    with open(os.path.join(root, "intrinsics_default.json")) as f:
        K = json.load(f)
    assert len(K) == 3 and len(K[0]) == 3 and K[2][2] == 1.0


def test_stage_weights_mapping():
    fit = parse_into(FitCLIConfig,
                     ["--joint3d-weight", "1", "2", "3",
                      "--motion-prior-weight", "0", "0", "0.5"])
    w = fit.stage_weights()
    assert len(w) == 3
    assert isinstance(w[0], StageWeights)
    assert (w[0].joints3d, w[1].joints3d, w[2].joints3d) == (1, 2, 3)
    assert w[2].motion_prior == 0.5
    assert w[0].motion_prior == 0.0


def test_num_iters_scale_parses():
    """--num-iters-scale N multiplies every stage budget and the stage-3
    freeze boundaries (reference effective effort = scale 20, see
    RESULTS.md iteration-budget semantics)."""
    from humor_tpu.utils.config import FitCLIConfig, parse_into

    cfg = parse_into(FitCLIConfig, ["--num-iters", "3", "4", "5",
                                    "--num-iters-scale", "20"],
                     prog="t")
    assert cfg.num_iters_scale == 20
    assert tuple(int(n) * cfg.num_iters_scale for n in cfg.num_iters) \
        == (60, 80, 100)
