"""Synthetic-GT accuracy recovery: the in-env proxy for the driver
baseline's "wall-clock at MPJPE parity" clause (BASELINE.md).

The full framework pipeline runs end to end: HuMoR trains briefly on the
procedural synthetic-AMASS generator (supervised + scheduled-sampling
curriculum), a mini VPoser trains on the same pose distribution, then the
FULL 3-stage TTO fits a held-out synthetic window corrupted with the
fit-dataset noise + middle-third occlusion, and the recovered motion must
come back under absolute MPJPE bounds — not just "the loss went down".

Key claims asserted (measured with the deterministic zoom line search,
bounds at ~1.3x margin; see RESULTS.md "Synthetic-GT recovery"):
  * visible-frame MPJPE: 3.556 m (init) -> 0.0967 m (stage 2) ->
    0.1052 m (stage 3 — after the round-3 first-step canonicalization
    fix, stage 3 no longer trades data fidelity for prior consistency);
  * occluded-frame MPJPE: stage 3's motion prior IN-PAINTS the unseen
    middle third ~3x better than the per-frame stages (0.2806 m ->
    0.0974 m) — the core HuMoR capability (reference
    motion_optimizer.py:202-676, eval_utils.py:71-134).
The fixture pins `lbfgs_linesearch="zoom"`: the parallel search's
discrete candidate grid can flip under fp-reassociation drift (CLAUDE.md),
which is what previously forced 64%-headroom bounds.

Why training is part of the fixture: with random-init networks the
stage-3 latent rollout cannot represent arbitrary motion and L-BFGS
cannot usefully invert a random 4x1024 MLP — accuracy recovery is only
well-posed against a (briefly) trained model, exactly as in the
reference, whose released checkpoints cannot ship in this env.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.fitting import energies as E
from humor_tpu.fitting import optimizer as O
from humor_tpu.models import humor as H

B, T = 2, 10
NOISE_STD = 0.02  # metres, per-coordinate

MODEL = synthetic_smpl_model()
CFG = H.HumorConfig()


@pytest.fixture(scope="module")
def trained_humor():
    """~2.5 min CPU curriculum: 300 supervised + 150 scheduled-sampling
    steps at batch 48 x 10 frames with the full SMPL losses (shared with
    benchmarks/bench_knee.py via humor_tpu.testing so the accuracy-vs-
    effort sweep measures the exact model this test asserts about)."""
    from humor_tpu.testing import train_mini_humor

    return train_mini_humor(MODEL, CFG)


@pytest.fixture(scope="module")
def trained_vposer():
    """Mini VPoser (hidden=96) autoencoding the synthetic pose
    distribution (~10 s)."""
    from humor_tpu.testing import train_mini_vposer

    return train_mini_vposer(MODEL)


@pytest.fixture(scope="module")
def models(trained_humor, trained_vposer):
    vcfg, vparams = trained_vposer
    return O.TTOModels(body=MODEL, vposer_cfg=vcfg, vposer=vparams,
                       humor_cfg=CFG, humor=trained_humor, init_gmm=None)


@pytest.fixture(scope="module")
def gt_joints():
    """Held-out window from the same generator (seed disjoint from the
    training seeds 0..39 / 100)."""
    wt, _ = synthetic_world_batch(777, B, T, model=MODEL)
    return np.asarray(wt["joints"]).reshape(B, T, -1, 3)


@pytest.fixture(scope="module")
def observed(gt_joints):
    """GT joints + gaussian noise + inf-masked middle third (the
    fit-dataset corruption pipeline, data/fit_dataset.py:89-96)."""
    rng = np.random.RandomState(11)
    noisy = (gt_joints
             + rng.randn(*gt_joints.shape).astype(np.float32) * NOISE_STD)
    occ = noisy.copy()
    occ[:, T // 3: 2 * T // 3] = np.inf
    return {"joints3d": jnp.asarray(occ)}


@pytest.fixture(scope="module")
def tto_cfg():
    w1 = E.StageWeights(joints3d=1.0)
    w2 = E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                        joints3d_smooth=0.1)
    w3 = E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                        motion_prior=1e-4, joint_consistency=10.0,
                        bone_length=10.0, joints3d_rollout=0.1)
    # zoom line search: deterministic sequential semantics (CLAUDE.md —
    # the parallel search's discrete candidate grid can flip under
    # fp-reassociation drift, which is what forced the old 64%-headroom
    # bounds; zoom lets the bounds sit ~25% above the measured values)
    return O.TTOConfig(seq_len=T, stage_weights=(w1, w2, w3),
                       num_iters=(15, 25, 40),
                       lbfgs_linesearch="zoom",
                       stage3_tune_init_num_frames=5,
                       stage3_freeze_start=10, stage3_freeze_end=20)


VIS = np.ones(T, bool)
VIS[T // 3: 2 * T // 3] = False  # frames the occlusion masks out


def _mpjpe(pred_joints, gt, frame_mask):
    """Mean per-joint position error (m) over the selected frames."""
    err = np.linalg.norm(
        np.asarray(pred_joints).reshape(B, T, -1, 3) - gt, axis=-1)
    return float(err[:, frame_mask].mean())


@pytest.fixture(scope="module")
def recovered(tto_cfg, models, observed):
    res = O.run(tto_cfg, models, observed)
    per_stage = {}
    for st in ("stage1", "stage2", "stage3"):
        s = res.per_stage[st]
        p = O.smpl_results(models.body, s["trans"], s["root_orient"],
                           s["pose_body"], s["betas"], verts="none")
        per_stage[st] = np.asarray(p["joints3d"])
    return res, per_stage


def test_visible_frames_recovered(recovered, gt_joints, tto_cfg, models,
                                  observed):
    res, joints = recovered
    init_vars = O.init_variables(tto_cfg, models, B, observed)
    pred0, _ = O._stage12_pred(models, init_vars)
    err_init = _mpjpe(pred0["joints3d"], gt_joints, VIS)
    assert err_init > 1.0, f"degenerate init {err_init:.3f} m"

    err_s2 = _mpjpe(joints["stage2"], gt_joints, VIS)
    err_s3 = _mpjpe(joints["stage3"], gt_joints, VIS)
    print(f"\n[tto-accuracy] vis: init {err_init:.4f} s2 {err_s2:.4f} "
          f"s3 {err_s3:.4f}")
    # measured with the deterministic zoom search (round 3, post
    # first-step-canonicalization fix): init 3.556 -> stage2 0.0967 ->
    # stage3 0.1052 (m); bounds at ~1.3x so a real quality regression
    # fails CI
    assert err_s2 < 0.13, f"stage-2 visible MPJPE {err_s2:.4f} m"
    assert err_s3 < 0.14, f"stage-3 visible MPJPE {err_s3:.4f} m"
    assert err_s3 < err_init / 20.0, (err_init, err_s3)


def test_motion_prior_inpaints_occlusion(recovered, gt_joints):
    """The core HuMoR capability: the stage-3 motion prior reconstructs
    the inf-masked middle third better than any per-frame stage can.
    Measured with the deterministic zoom search (round 3, post
    first-step-canonicalization fix): stage2 0.2806 -> stage3 0.0974 m —
    a ~3x in-painting win, asserted strictly (the old 64%-headroom
    bounds existed only because the parallel search's candidate flips
    made the trajectory high-variance; zoom removes that)."""
    _, joints = recovered
    occ_s2 = _mpjpe(joints["stage2"], gt_joints, ~VIS)
    occ_s3 = _mpjpe(joints["stage3"], gt_joints, ~VIS)
    print(f"\n[tto-accuracy] occ: s2 {occ_s2:.4f} s3 {occ_s3:.4f}")
    assert np.all(np.isfinite(joints["stage3"]))
    assert occ_s3 < 0.13, f"occluded-frame MPJPE {occ_s3:.4f} m"
    assert occ_s3 < occ_s2 * 0.6, (occ_s2, occ_s3)


def test_init_rollout_is_frame_equivariant(models):
    """Translating the initial state and observations by +5 m must
    translate the stage-3 latent rollout by exactly +5 m — the TTO-level
    version of the reference's canonicalization probe (test_humor.py:
    284-286). Guards the round-3 first-step canonicalization fix
    (rollout_latent_motion, fitting/optimizer.py): without
    canonicalize_input the rollout's first step sees the raw world frame
    and the trajectory DEPENDS on the world origin (measured 3.16 m
    MPJPE drift at arbitrary offsets, RESULTS.md "Numerical findings"
    #4). Unlike a full-fit comparison this is deterministic — no
    fp-chaotic L-BFGS trajectory in the loop (a full-fit A/B measured a
    0.08 m quality delta from line-search chaos alone at this budget)."""
    import jax.numpy as jnp

    from humor_tpu.ops import transforms

    wt, meta = synthetic_world_batch(778, B, T, model=MODEL)
    trans = jnp.asarray(wt["trans"])
    root = transforms.rotmat_to_aa(
        jnp.asarray(np.asarray(wt["root_orient"]).reshape(B, T, 3, 3)))
    pose = transforms.rotmat_to_aa(
        jnp.asarray(np.asarray(wt["pose_body"]).reshape(B, T, 21, 3, 3))
    ).reshape(B, T, 63)
    betas = jnp.asarray(meta["betas"])
    cfg = O.TTOConfig(seq_len=T)

    def roll(tr):
        zm = O.infer_latent_motion(models, tr, root, pose, betas, 30.0)
        tv, jv, rv = O.estimate_velocities(models.body, tr, root, pose,
                                           betas, 30.0)
        lp = O.vp.pose2latent(models.vposer_cfg, models.vposer, pose)
        vars_ = {"trans": tr[:, :1], "root_orient": root[:, :1],
                 "latent_pose": lp[:, :1], "betas": betas,
                 "trans_vel": tv[:, :1], "joints_vel": jv[:, :1],
                 "root_orient_vel": rv[:, :1]}
        out, _ = O.rollout_latent_motion(cfg, models, vars_, zm)
        return np.asarray(out["joints"])

    off = np.asarray([5.0, 5.0, 0.0], np.float32)
    j_base = roll(trans)
    j_shift = roll(trans + off)
    np.testing.assert_allclose(j_shift, j_base + off, atol=5e-3)


def test_betas_stay_bounded(recovered):
    """GT betas are ~N(0, 0.5); the fit must not absorb noise into
    extreme shapes (shape prior active in stages 2/3)."""
    res, _ = recovered
    betas = np.asarray(res.final["betas"])
    assert np.all(np.abs(betas) < 2.0), betas
