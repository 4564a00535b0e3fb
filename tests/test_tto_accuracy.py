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


# ===========================================================================
# RGB (i3DB/PROX) modality — the workload BASELINE.md names as the driver
# metric: 2D OpenPose keypoints + floor-plane optimization + cam2prior
# rollout + overlap consistency (reference fitting_loss.py:317-358 2D
# energy, motion_optimizer.py:461-610 camera-frame stage 3). The fixture
# projects a held-out synthetic-GT sequence through a known camera,
# corrupts with pixel noise + a zero-confidence occlusion window, fits the
# full RGB pipeline, and asserts absolute camera-frame MPJPE and
# floor-plane recovery.
# ===========================================================================

OV = 4              # window overlap (frames)
PIX_NOISE = 2.0     # px
# camera frame: x = world x, y = -world z (y down, -y up as the geometry
# module expects), z = world y (optical axis = world +y)
R_WC = np.asarray([[1.0, 0.0, 0.0],
                   [0.0, 0.0, -1.0],
                   [0.0, 1.0, 0.0]], np.float32)

RGB_VIS = np.ones(T, bool)
RGB_VIS[T // 3: 2 * T // 3] = False   # zero-confidence frames per window


@pytest.fixture(scope="module")
def rgb_fixture():
    """Two overlapping camera-frame windows of one synthetic sequence +
    their projected/corrupted 2D observations and the GT floor plane."""
    from humor_tpu.fitting import geometry as geo
    from humor_tpu.ops import transforms

    T_total = 2 * T - OV
    wt, meta = synthetic_world_batch(901, 1, T_total, model=MODEL)
    trans_w = jnp.asarray(wt["trans"])
    root_w = transforms.rotmat_to_aa(jnp.asarray(
        np.asarray(wt["root_orient"]).reshape(1, T_total, 3, 3)))
    pose_w = transforms.rotmat_to_aa(jnp.asarray(
        np.asarray(wt["pose_body"]).reshape(1, T_total, 21, 3, 3))
    ).reshape(1, T_total, 63)
    betas = jnp.asarray(meta["betas"])
    joints_w = np.asarray(wt["joints"]).reshape(1, T_total, -1, 3)

    # place the body ~3 m in front of the camera
    c = np.asarray(trans_w).mean(axis=(0, 1))
    t_wc = np.asarray([0.0, 0.0, 3.0], np.float32) - R_WC @ c
    j0 = O.smpl_results(MODEL, jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)),
                        jnp.zeros((1, 1, 63)), betas,
                        verts="none")["joints3d"][:, 0, 0]
    trans_c, root_c = geo.rigid_transform_smpl_params(
        trans_w, root_w, j0, R_WC, t_wc)

    # the param transform must move the posed body rigidly
    jc = np.asarray(O.smpl_results(MODEL, trans_c, root_c, pose_w, betas,
                                   verts="none")["joints3d"])
    np.testing.assert_allclose(
        jc, joints_w @ R_WC.T + t_wc, atol=2e-4)

    # slice into B=2 overlapping windows
    iv = np.asarray([[0, T], [T - OV, 2 * T - OV]])
    sl = [slice(a, b) for a, b in iv]
    win = lambda x: jnp.concatenate([x[:, s] for s in sl], axis=0)
    gt = {
        "trans": win(trans_c), "root_orient": win(root_c),
        "pose_body": win(pose_w),
        "joints3d": np.stack([jc[0, s] for s in sl]),
        "betas": jnp.tile(betas, (2, 1)),
    }

    # GT floor: the generator grounds contacts at the min joint height
    z0 = float(joints_w[..., 2].min())
    n_c = R_WC @ np.asarray([0.0, 0.0, 1.0], np.float32)
    plane4 = np.concatenate([n_c, [z0 + float(n_c @ t_wc)]]).astype(
        np.float32)

    # project to 2D through the synthetic camera
    n_out = MODEL.num_joints + MODEL.vtx_joint_ids.size
    smpl2op = tuple(int(i % n_out) for i in range(25))
    cam_f = jnp.tile(jnp.asarray([500.0, 500.0]), (2, 1))
    cam_center = jnp.tile(jnp.asarray([320.0, 240.0]), (2, 1))
    pred = O.smpl_results(MODEL, gt["trans"], gt["root_orient"],
                          gt["pose_body"], gt["betas"], verts="none")
    full = jnp.concatenate([pred["joints3d"], pred["joints3d_extra"]],
                           axis=2)
    op3d = full[:, :, np.asarray(smpl2op)].reshape(2 * T, -1, 3)
    eye3 = jnp.broadcast_to(jnp.eye(3), (2 * T, 3, 3))
    uv = geo.perspective_projection(
        op3d, eye3, jnp.zeros((2 * T, 3)),
        jnp.repeat(cam_f, T, axis=0), jnp.repeat(cam_center, T, axis=0)
    ).reshape(2, T, 25, 2)

    rng = np.random.RandomState(13)
    uv = np.asarray(uv) + rng.randn(2, T, 25, 2).astype(np.float32) \
        * PIX_NOISE
    conf = np.ones((2, T, 25, 1), np.float32)
    conf[:, ~RGB_VIS] = 0.0      # occlusion window: joints unobserved
    uv[:, ~RGB_VIS] = 0.0
    observed = {
        "joints2d": jnp.asarray(
            np.concatenate([uv, conf], axis=-1, dtype=np.float32)),
        "cam_f": cam_f,
        "cam_center": cam_center,
        "floor_plane": jnp.tile(jnp.asarray(plane4), (2, 1)),
        "seq_interval": jnp.asarray(iv, jnp.int32),
    }
    return observed, gt, plane4, smpl2op


@pytest.fixture(scope="module")
def rgb_recovered(models, rgb_fixture):
    observed, gt, plane4, smpl2op = rgb_fixture
    w1 = E.StageWeights(joints2d=0.001, joints3d_smooth=100.0,
                        rgb_overlap_consist=200.0)
    w2 = E.StageWeights(joints2d=0.001, pose_prior=4e-4, shape_prior=6e-3,
                        joints3d_smooth=100.0, rgb_overlap_consist=200.0)
    # contact_vel/height are load-bearing for the RGB modality: they tie
    # the rolled-out feet to the optimized floor (prior-frame z=0),
    # which is what pins absolute depth and keeps the floor from
    # drifting — without them the first measurement saw a 47-degree
    # floor rotation and 0.74 m absolute MPJPE at 0.19 m root-aligned
    # (reference fit defaults: contact_vel 100, contact_height 10)
    w3 = E.StageWeights(joints2d=0.001, pose_prior=4e-4, shape_prior=6e-3,
                        motion_prior=1e-4, joint_consistency=10.0,
                        bone_length=10.0, contact_vel=100.0,
                        contact_height=10.0, floor_reg=0.167,
                        rgb_overlap_consist=200.0)
    # 4x the joints3d fixture's budget: the monocular problem is much
    # worse-conditioned — at (15, 25, 40) the fit is still ~13 px from
    # the 2-px noise floor and slides ~1 m along the view ray (measured,
    # RESULTS.md "RGB synthetic-GT recovery"); at (60, 100, 120) the
    # residual reaches ~6 px and absolute MPJPE lands at 0.17 m
    cfg = O.TTOConfig(seq_len=T, stage_weights=(w1, w2, w3),
                      energy=E.EnergyConfig(smpl2op_map=smpl2op),
                      num_iters=(60, 100, 120),
                      lbfgs_linesearch="zoom",
                      optim_floor=True,
                      stage3_tune_init_num_frames=5,
                      stage3_freeze_start=40, stage3_freeze_end=80)
    res = O.run(cfg, models, observed)
    per_stage = {}
    for st in ("stage2", "stage3"):
        s = res.per_stage[st]
        p = O.smpl_results(models.body, s["trans"], s["root_orient"],
                           s["pose_body"], s["betas"], verts="none")
        per_stage[st] = np.asarray(p["joints3d"])
    return res, per_stage


def _rgb_mpjpe(pred_joints, gt_joints, frame_mask, align_root=False):
    p = np.asarray(pred_joints).reshape(2, T, -1, 3)
    g = np.asarray(gt_joints).reshape(2, T, -1, 3)
    if align_root:
        p = p - p[:, :, :1]
        g = g - g[:, :, :1]
    err = np.linalg.norm(p - g, axis=-1)
    return float(err[:, frame_mask].mean())


def test_rgb_visible_frames_recovered(rgb_recovered, rgb_fixture):
    """Absolute camera-frame MPJPE on the frames the 2D energy saw —
    monocular fitting recovers depth through the bone-ratio init + priors,
    so this bounds the full 2D+floor+cam2prior pipeline, not just
    reprojection."""
    observed, gt, _, _ = rgb_fixture
    _, joints = rgb_recovered
    err_s2 = _rgb_mpjpe(joints["stage2"], gt["joints3d"], RGB_VIS)
    err_s3 = _rgb_mpjpe(joints["stage3"], gt["joints3d"], RGB_VIS)
    ra_s3 = _rgb_mpjpe(joints["stage3"], gt["joints3d"], RGB_VIS,
                       align_root=True)
    print(f"\n[rgb-accuracy] vis: s2 {err_s2:.4f} s3 {err_s3:.4f} "
          f"root-aligned s3 {ra_s3:.4f}")
    # bounds ~1.3x above measured (stage-3 vis 0.172 m absolute; see
    # RESULTS.md "RGB synthetic-GT recovery")
    assert err_s3 < 0.23, f"stage-3 visible MPJPE {err_s3:.4f} m"
    # measured 0.164 root-aligned (the absolute error is mostly pose,
    # not view-ray translation); bound at the same ~1.3x margin
    assert ra_s3 < 0.21, f"root-aligned visible MPJPE {ra_s3:.4f} m"


def test_rgb_occlusion_inpainted(rgb_recovered, rgb_fixture):
    """The zero-confidence middle third must be in-painted by the motion
    prior to within family of the visible-frame error — the reference's
    occluded-keypoint experiments (fit_imapper/fit_proxd)."""
    observed, gt, _, _ = rgb_fixture
    _, joints = rgb_recovered
    occ_s3 = _rgb_mpjpe(joints["stage3"], gt["joints3d"], ~RGB_VIS)
    ra_occ = _rgb_mpjpe(joints["stage3"], gt["joints3d"], ~RGB_VIS,
                        align_root=True)
    occ_s2 = _rgb_mpjpe(joints["stage2"], gt["joints3d"], ~RGB_VIS)
    print(f"\n[rgb-accuracy] occ: s2 {occ_s2:.4f} s3 {occ_s3:.4f} "
          f"root-aligned {ra_occ:.4f}")
    assert np.isfinite(occ_s3)
    # measured: stage2 0.321 -> stage3 0.178 m on the zero-confidence
    # middle third (bounds ~1.3x)
    assert occ_s3 < 0.24, f"occluded-frame MPJPE {occ_s3:.4f} m"
    assert occ_s3 < occ_s2, ("stage 3 must in-paint the occlusion "
                             "better than the per-frame stage 2",
                             occ_s2, occ_s3)


def test_rgb_floor_recovered(rgb_recovered, rgb_fixture):
    """The optimized floor plane must recover the GT camera-frame floor:
    normal to within a few degrees, offset to centimetres."""
    observed, gt, plane4, _ = rgb_fixture
    res, _ = rgb_recovered
    # final["floor_plane"] is already in parsed (unit normal, offset) form
    fitted = np.asarray(res.final["floor_plane"])
    assert fitted.shape[-1] == 4
    cos = np.sum(fitted[..., :3] * plane4[:3], axis=-1)
    off_err = np.abs(fitted[..., 3] - plane4[3])
    print(f"\n[rgb-accuracy] floor: cos {cos} off_err {off_err}")
    # measured: cos 0.986/0.994 (6-10 degrees), offset err 0.13/0.15 m
    assert np.all(cos > 0.96), f"floor normal off: cos {cos}"
    assert np.all(off_err < 0.22), f"floor offset error {off_err} m"
