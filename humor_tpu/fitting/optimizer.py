"""3-stage test-time motion optimizer — the flagship TTO pipeline.

Fits SMPL shape + motion to observations (3D joints/keypoints/point
clouds, 2D joints) by optimizing in VPoser's pose latent space and HuMoR's
motion latent space.

Behavioral parity target: /root/reference/humor/fitting/motion_optimizer.py
(MotionOptimizer.run :202-676, rollout_latent_motion :876-1019,
infer_latent_motion :805-874, estimate_velocities :744-801).

TPU-first design (the reference's host-driven L-BFGS closures are the #1
perf sink, SURVEY.md §3.2):
  * each stage is ONE jitted program: `run_lbfgs` scans L-BFGS iterations
    on device, and the stage-3 closure's sequence rollout is the
    `lax.scan` in humor_tpu.models.humor — zero host round trips within
    a stage;
  * the stage-3 freeze/refine sub-schedule (reference :479-511 swaps
    optimizers and requires_grad flags) becomes three jitted segments of
    the same variable pytree with gradient masks;
  * the batch dimension (parallel sub-sequence windows) is fully
    data-parallel and shards over TPU cores; overlap-consistency terms
    couple neighbors inside the jitted loss.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.body_model import smpl as smpl_lib
from humor_tpu.fitting import energies as E
from humor_tpu.fitting import geometry as geo
from humor_tpu.fitting.lbfgs import make_mask, run_lbfgs
from humor_tpu.models import gmm as gmm_lib
from humor_tpu.models import humor as H
from humor_tpu.models import vposer as vp
from humor_tpu.ops import transforms

_HI = jax.lax.Precision.HIGHEST

CONTACT_THRESH = 0.5


@dataclass(frozen=True)
class TTOConfig:
    seq_len: int
    num_betas: int = C.BETA_SIZE
    stage_weights: Tuple[E.StageWeights, E.StageWeights, E.StageWeights] = (
        E.StageWeights(joints3d=1.0),
        E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                       joints3d_smooth=1.0),
        E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                       motion_prior=7.5e-4, init_motion_prior=7.5e-4,
                       joint_consistency=100.0, bone_length=2000.0),
    )
    energy: E.EnergyConfig = E.EnergyConfig()
    num_iters: Tuple[int, int, int] = (30, 70, 70)
    lbfgs_max_linesearch: int = 20  # zoom search only (probe budget)
    lbfgs_history: int = 10
    # "auto" (default): "parallel" at small window batches (value+grad
    # candidates ride idle MXU lanes; 13% faster at B=2), "armijo" at
    # B >= 12 (38% faster at B=16 where the grid fills the 128-row MXU
    # tile). Chip A/Bs: RESULTS.md "line-search choice by batch" — which
    # also documents why a per-stage armijo mix was rejected (2x knee
    # accuracy regression). Besides "auto": a single name applies to all
    # stages, a 3-tuple sets each stage — "parallel" (speculative
    # vectorized strong-Wolfe, one vmapped closure eval per iteration),
    # "armijo" (value-only speculative grid + one value_and_grad at the
    # accepted point), "zoom" (optax sequential zoom — the reference's
    # torch strong_wolfe semantics, 2-8+ evals/iter), "hybrid" (parallel
    # bulk + a zoom polish tail of lbfgs_polish_frac of each stage's
    # iterations — the careful sequential search escapes the flats the
    # speculative grid wanders on hard seeds; RESULTS.md round 4).
    lbfgs_linesearch: Any = "auto"
    # fraction of each stage's iterations run as the hybrid's sequential
    # zoom polish tail. Zoom costs ~6-8x per iteration (RESULTS.md), so
    # 0.08 keeps the hybrid within ~1.5x of the parallel wall-clock.
    lbfgs_polish_frac: float = 0.08
    # parallel/armijo search grid size; None = auto by batch:
    # K = clamp(128 // B, 4, 16). Rationale (RESULTS.md round 3): the
    # candidate-grid rollout runs at M = K*B MXU rows and every weight
    # tile costs one pass for any M <= 128, so candidates are FREE until
    # K*B ~ 128 — small batches get a finer grid at no cost, large
    # batches shed candidates instead of paying extra MXU passes.
    lbfgs_candidates: Optional[int] = 8
    # convergence early exit (reference torch-LBFGS tolerance_grad /
    # tolerance_change semantics; run_lbfgs docstring). None = fixed
    # iteration count (lax.scan); set e.g. 1e-7 / 1e-9 (torch defaults)
    # to stop converged stages early under a lax.while_loop.
    lbfgs_tol_grad: Optional[float] = None
    lbfgs_tol_change: Optional[float] = None
    # consecutive sub-tol_change iterations before the early exit fires;
    # must absorb monotone-safeguard restart cycles (reject-restart-
    # recover), which move nothing for a few iterations but then progress
    lbfgs_stall_patience: int = 3
    data_fps: float = 30.0
    optim_floor: bool = False
    stage3_tune_init_state: bool = True
    stage3_tune_init_num_frames: int = 15
    stage3_freeze_start: int = 30
    stage3_freeze_end: int = 55
    stage3_contact_refine_only: bool = False


class TTOModels(NamedTuple):
    """All frozen model parameters the optimizer closes over."""
    body: smpl_lib.SmplModel
    vposer_cfg: vp.VPoserConfig
    vposer: Dict
    humor_cfg: H.HumorConfig
    humor: Dict
    init_gmm: Optional[gmm_lib.GmmParams] = None


# ---------------------------------------------------------------------------
# SMPL forward over a sequence batch
# ---------------------------------------------------------------------------

def _keypt_ids(body) -> np.ndarray:
    return np.asarray([i for i in C.KEYPT_VERTS if i < body.num_verts],
                      np.int32)


def slice_observations(observed: Dict[str, jnp.ndarray],
                       nsteps: int) -> Dict[str, jnp.ndarray]:
    """Restrict time-indexed observations to the first `nsteps` frames.

    Dispatches on the explicit `energies.TIME_INDEXED_OBS_KEYS` schema —
    never on array shape: a shape heuristic (`val.shape[1] == T`)
    silently mis-slices (B, K) per-window metadata whenever K happens to
    equal T (e.g. `floor_plane` (B, 3) with T == 3)."""
    return {k: (v[:, :nsteps] if k in E.TIME_INDEXED_OBS_KEYS else v)
            for k, v in observed.items()}


def batch_size_of(observed: Dict[str, Any]) -> int:
    """Window-batch size from any top-level array value (nested dicts
    like 'prev_batch_overlap_res' make `next(iter(observed))`
    order-dependent, and their leaves carry the PREVIOUS batch's size)."""
    top = {k: v for k, v in observed.items()
           if k != "prev_batch_overlap_res"}
    return jax.tree_util.tree_leaves(top)[0].shape[0]


def resolve_candidates(num: Optional[int], batch: int) -> int:
    """Line-search grid size; None = auto from the window batch.

    K = clamp(128 // B, 4, 16): the candidate-grid rollout runs at
    M = K*B MXU rows and each weight tile costs one MXU pass for any
    M <= 128 (RESULTS.md "weight-stationary MXU bound"), so candidates
    are free until K*B ~ 128 — small batches get a finer grid at no
    cost, large batches shed candidates instead of paying extra passes.

    Any falsy value (None or 0) means auto — the config layer documents
    "0 = auto-scale" and the CLI passes 0 through, so 0 must not reach
    run_lbfgs as a literal grid size (advisor finding, round 3).
    """
    if num:
        return num
    return max(4, min(16, 128 // max(int(batch), 1)))


def verts_mode_for(observed) -> str:
    """Cheapest vertex set the energies actually read, by observed keys:
    'full' (point-cloud chamfer needs all verts), 'keypt' (43-keypoint
    verts3d data term or overlap-consistency), 'none' (joints-only)."""
    if "points3d" in observed:
        return "full"
    if "verts3d" in observed or "seq_interval" in observed:
        return "keypt"
    return "none"


def smpl_results(body: smpl_lib.SmplModel,
                 trans: jnp.ndarray,        # (B, T, 3)
                 root_orient: jnp.ndarray,  # (B, T, 3) aa
                 body_pose: jnp.ndarray,    # (B, T, 63) aa
                 betas: jnp.ndarray,        # (B, nb)
                 verts: str = "full",
                 ) -> Dict[str, jnp.ndarray]:
    """One batched LBS pass over all B*T frames -> typed prediction dict
    (reference smpl_results, motion_optimizer.py:1065-1110).

    `verts` selects how much of the mesh is skinned (TTO hot path —
    the reference always skins all 6890 verts even for joints-only
    fits): 'full' -> points3d+verts3d, 'keypt' -> verts3d only,
    'none' -> joints only. Extra OpenPose vertex joints are always
    produced."""
    B, T = trans.shape[:2]
    if verts == "full":
        vert_ids = None
    elif verts == "keypt":
        vert_ids = _keypt_ids(body)
    else:
        vert_ids = np.zeros((0,), np.int32)
    out = smpl_lib.forward(
        body,
        root_orient.reshape(B * T, 3),
        body_pose.reshape(B * T, -1),
        jnp.repeat(betas, T, axis=0),
        trans.reshape(B * T, 3),
        vert_ids=vert_ids,
    )
    Jtr = out.Jtr.reshape(B, T, -1, 3)
    nj = C.NUM_SMPL_JOINTS
    res = {
        "joints3d": Jtr[:, :, :nj],
        "joints3d_extra": Jtr[:, :, nj:],
    }
    if verts == "full":
        v = out.v.reshape(B, T, -1, 3)
        res["points3d"] = v
        res["verts3d"] = v[:, :, _keypt_ids(body)]
    elif verts == "keypt":
        res["verts3d"] = out.v.reshape(B, T, -1, 3)
    return res


# ---------------------------------------------------------------------------
# Velocity estimation (central differences)
# ---------------------------------------------------------------------------

def estimate_linear_velocity(seq: jnp.ndarray, h: float) -> jnp.ndarray:
    """(B, T, ...) -> same-shape velocities: forward/central/backward
    differences (reference :766-781)."""
    init = (seq[:, 1:2] - seq[:, 0:1]) / h
    mid = (seq[:, 2:] - seq[:, :-2]) / (2.0 * h)
    last = (seq[:, -1:] - seq[:, -2:-1]) / h
    return jnp.concatenate([init, mid, last], axis=1)


def estimate_angular_velocity(rot_seq: jnp.ndarray, h: float) -> jnp.ndarray:
    """(B, T, 3, 3) rotations -> (B, T, 3) angular velocities via
    skew(dR/dt R^T) (reference :783-801)."""
    dRdt = estimate_linear_velocity(rot_seq, h)
    w_mat = jnp.matmul(dRdt, jnp.swapaxes(rot_seq, -1, -2), precision=_HI)
    w_x = (-w_mat[..., 1, 2] + w_mat[..., 2, 1]) / 2.0
    w_y = (w_mat[..., 0, 2] - w_mat[..., 2, 0]) / 2.0
    w_z = (-w_mat[..., 0, 1] + w_mat[..., 1, 0]) / 2.0
    return jnp.stack([w_x, w_y, w_z], axis=-1)


def estimate_velocities(body: smpl_lib.SmplModel, trans, root_orient,
                        body_pose, betas, fps: float):
    """(trans_vel, joints_vel, root_orient_vel) from an SMPL sequence."""
    h = 1.0 / fps
    pred = smpl_results(body, trans, root_orient, body_pose, betas,
                        verts="none")
    trans_vel = estimate_linear_velocity(trans, h)
    joints_vel = estimate_linear_velocity(pred["joints3d"], h)
    R = transforms.aa_to_rotmat(root_orient)
    root_orient_vel = estimate_angular_velocity(R, h)
    return trans_vel, joints_vel, root_orient_vel


# ---------------------------------------------------------------------------
# HuMoR-space helpers
# ---------------------------------------------------------------------------

def _seq_state_dict(body, trans, root_orient, body_pose, betas, fps):
    """SMPL sequence -> HuMoR global-state dict with matrix rotations
    (components (B, T, D))."""
    B, T = trans.shape[:2]
    pred = smpl_results(body, trans, root_orient, body_pose, betas,
                        verts="none")
    trans_vel, joints_vel, root_orient_vel = _vel_from_results(
        trans, root_orient, pred["joints3d"], fps)
    return {
        "trans": trans,
        "trans_vel": trans_vel,
        "root_orient": transforms.aa_to_rotmat(root_orient).reshape(B, T, 9),
        "root_orient_vel": root_orient_vel,
        "pose_body": transforms.aa_to_rotmat(
            body_pose.reshape(B, T, -1, 3)).reshape(B, T, -1),
        "joints": pred["joints3d"].reshape(B, T, -1),
        "joints_vel": joints_vel.reshape(B, T, -1),
    }


def _vel_from_results(trans, root_orient, joints3d, fps):
    h = 1.0 / fps
    trans_vel = estimate_linear_velocity(trans, h)
    joints_vel = estimate_linear_velocity(joints3d, h)
    R = transforms.aa_to_rotmat(root_orient)
    root_orient_vel = estimate_angular_velocity(R, h)
    return trans_vel, joints_vel, root_orient_vel


def infer_latent_motion(models: TTOModels, trans, root_orient, body_pose,
                        betas, fps) -> jnp.ndarray:
    """Posterior-mean latent sequence z_{1..T-1} for the current SMPL
    trajectory (reference infer_latent_motion :805-874)."""
    seq = _seq_state_dict(models.body, trans, root_orient, body_pose,
                          betas, fps)
    res = H.infer_global_seq(models.humor_cfg, models.humor, seq)
    return res.posterior[0]


def _expand_contacts(contact_logits: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                           jnp.ndarray]:
    """(B, Tm1, 9) logits -> full-body (B, T, 22) conf + binary contacts,
    first frame repeated (reference :985-1005)."""
    conf9 = jax.nn.sigmoid(contact_logits)
    B, Tm1 = conf9.shape[:2]
    full = jnp.zeros((B, Tm1, C.NUM_SMPL_JOINTS), conf9.dtype)
    full = full.at[:, :, np.asarray(C.CONTACT_INDS)].set(conf9)
    conf = jnp.concatenate([full[:, 0:1], full], axis=1)
    binary = (conf > CONTACT_THRESH).astype(conf9.dtype)
    return conf, binary


def rollout_latent_motion(cfg: TTOConfig, models: TTOModels,
                          variables: Dict[str, jnp.ndarray],
                          latent_motion: jnp.ndarray,
                          cam2prior: Optional[Tuple] = None,
                          ) -> Tuple[Dict, Dict]:
    """Roll the initial-state variables forward through HuMoR with the
    latent motion sequence (reference rollout_latent_motion :876-1019).

    variables: trans/root_orient/latent_pose are (B, 1, .) initial state;
    betas (B, nb); *_vel (B, 1, .) prior-frame velocities.
    Returns (prior-frame dict, camera-frame dict); identical when
    cam2prior is None.
    """
    B = variables["trans"].shape[0]
    Tm1 = latent_motion.shape[1]
    body_pose0 = vp.latent2pose(models.vposer_cfg, models.vposer,
                                variables["latent_pose"])  # (B, 1, 63)
    cam_trans0, cam_root0 = variables["trans"], variables["root_orient"]
    trans0, root0 = cam_trans0, cam_root0
    if cam2prior is not None:
        R, t, rh = cam2prior
        prior = geo.apply_cam2prior(
            cam_trans0, cam_root0, R, t, rh,
            jnp.zeros((B,), jnp.int32),
            smpl_root_joint_fn=lambda tr, ro: smpl_results(
                models.body, tr, ro, body_pose0,
                variables["betas"], verts="none")["joints3d"][..., 0, 2])
        trans0, root0 = prior["trans"], prior["root_orient"]

    pred0 = smpl_results(models.body, trans0, root0, body_pose0,
                         variables["betas"], verts="none")
    joints0 = pred0["joints3d"]  # (B, 1, 22, 3)

    init_state = {
        "trans": trans0[:, 0],
        "trans_vel": variables["trans_vel"][:, 0],
        "root_orient": transforms.aa_to_rotmat(root0[:, 0]).reshape(B, 9),
        "root_orient_vel": variables["root_orient_vel"][:, 0],
        "pose_body": transforms.aa_to_rotmat(
            body_pose0[:, 0].reshape(B, -1, 3)).reshape(B, -1),
        "joints": joints0[:, 0].reshape(B, -1),
        "joints_vel": variables["joints_vel"][:, 0].reshape(B, -1),
    }

    # canonicalize_input: the model's prior/decoder were trained on
    # heading-canonical past frames. The reference rolls out with
    # canonicalize_input=False (motion_optimizer.py:408,542,616) because
    # its inputs are always near-canonical already — AMASS fit windows are
    # aligned per window, and compute_cam2prior heading-aligns the RGB
    # path — so canonicalization is ~identity there. Our TTO accepts
    # arbitrary world-frame observations; skipping it puts the FIRST step
    # out of distribution and the open-loop chain compounds the error
    # (measured on the synthetic fixture: T=60 init-rollout MPJPE 3.16 m
    # -> 0.42 m with canonicalization; RESULTS.md). uncanonicalize_output
    # returns the trajectory in the input frame, so downstream energies
    # are unchanged.
    roll = H.rollout(models.humor_cfg, models.humor,
                     jax.random.PRNGKey(0), init_state, Tm1,
                     z_seq=latent_motion,
                     canonicalize_input=True, uncanonicalize_output=True)
    w = roll.world

    root_mats = w["root_orient"].reshape(B, Tm1, 3, 3)
    pose_mats = w["pose_body"].reshape(B, Tm1, -1, 3, 3)
    out = {
        "trans": jnp.concatenate([trans0, w["trans"]], axis=1),
        "root_orient": jnp.concatenate(
            [root0, transforms.rotmat_to_aa(root_mats)], axis=1),
        "pose_body": jnp.concatenate(
            [body_pose0,
             transforms.rotmat_to_aa(pose_mats).reshape(B, Tm1, -1)],
            axis=1),
        "joints": jnp.concatenate(
            [joints0, w["joints"].reshape(B, Tm1, -1, 3)], axis=1),
        "cond_prior": roll.prior,
    }
    if "contacts" in w:
        conf, binary = _expand_contacts(w["contacts"])
        out["contacts_conf"] = conf
        out["contacts"] = binary

    if cam2prior is not None:
        R, t, rh = cam2prior
        cam = geo.apply_cam2prior(out["trans"], out["root_orient"], R, t,
                                  rh, jnp.zeros((B,), jnp.int32),
                                  inverse=True)
    else:
        cam = {"trans": out["trans"], "root_orient": out["root_orient"]}
    cam["pose_body"] = out["pose_body"]
    return out, cam


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_variables(cfg: TTOConfig, models: TTOModels, batch_size: int,
                   observed: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Stage-1/2 variable pytree (reference __init__ :75-90 +
    initialize :141-199)."""
    B, T = batch_size, cfg.seq_len
    trans = jnp.zeros((B, T, 3))
    root_orient = jnp.zeros((B, T, 3)).at[..., 0].set(jnp.pi)
    variables = {
        "trans": trans,
        "root_orient": root_orient,
        "latent_pose": jnp.zeros((B, T, models.vposer_cfg.latent_dim)),
        "betas": jnp.zeros((B, cfg.num_betas)),
    }
    if cfg.optim_floor and "floor_plane" in observed:
        fp = observed["floor_plane"]
        variables["floor_plane"] = fp[..., :3] * fp[..., 3:]
    if "points3d" in observed:
        pts = observed["points3d"]
        safe = jnp.where(E.visible_mask(pts), pts, 0.0)
        cnt = jnp.maximum(
            jnp.sum(E.visible_mask(pts[..., 0]), axis=2, keepdims=True), 1)
        variables["trans"] = jnp.sum(safe, axis=2) / cnt
    elif "joints2d" in observed and "cam_f" in observed:
        variables["trans"] = _init_z_from_bones(cfg, models, variables,
                                                observed)
    return variables


def _init_z_from_bones(cfg, models, variables, observed) -> jnp.ndarray:
    """Depth init from 3D/2D mean bone-length ratio (reference :160-199,
    PROX heuristic)."""
    B, T = variables["trans"].shape[:2]
    body_pose = vp.latent2pose(models.vposer_cfg, models.vposer,
                               variables["latent_pose"])
    pred = smpl_results(models.body, variables["trans"],
                        variables["root_orient"], body_pose,
                        variables["betas"], verts="none")
    full = jnp.concatenate([pred["joints3d"], pred["joints3d_extra"]],
                           axis=2)
    op_j3d = full[:, :, np.asarray(cfg.energy.smpl2op_map)]
    obs2d = observed["joints2d"][..., :2]
    conf2d = observed["joints2d"][..., 2]

    num_vis = jnp.sum(conf2d > 0.0, axis=2)       # (B, T)
    best_t = jnp.argmax(num_vis, axis=1)          # (B,)

    edges = np.asarray(C.OP_EDGE_LIST)            # (E, 2)
    b3d = jnp.linalg.norm(
        op_j3d[:, 0, edges[:, 0]] - op_j3d[:, 0, edges[:, 1]], axis=-1)
    b2d = jnp.linalg.norm(
        obs2d[:, :, edges[:, 0]] - obs2d[:, :, edges[:, 1]], axis=-1)
    c2d = jnp.minimum(conf2d[:, :, edges[:, 0]], conf2d[:, :, edges[:, 1]])
    b2d_best = jnp.take_along_axis(
        b2d, best_t[:, None, None], axis=1)[:, 0]
    c2d_best = jnp.take_along_axis(
        c2d, best_t[:, None, None], axis=1)[:, 0]
    mean_b3d = jnp.mean(b3d, axis=1)
    mean_b2d = jnp.mean(b2d_best * (c2d_best > 0.0), axis=1)
    init_z = observed["cam_f"][:, 0] * (mean_b3d
                                        / jnp.maximum(mean_b2d, 1e-6))
    return variables["trans"].at[..., 2].set(init_z[:, None])


# ---------------------------------------------------------------------------
# The 3-stage driver
# ---------------------------------------------------------------------------

class TTOResult(NamedTuple):
    final: Dict[str, jnp.ndarray]          # optimized SMPL sequence (cam)
    per_stage: Dict[str, Dict]             # stage1/stage2/stage3 outputs
    losses: Dict[str, jnp.ndarray]         # per-stage loss histories


def _stage12_pred(models, variables, observed=None):
    body_pose = vp.latent2pose(models.vposer_cfg, models.vposer,
                               variables["latent_pose"])
    mode = verts_mode_for(observed) if observed is not None else "full"
    pred = smpl_results(models.body, variables["trans"],
                        variables["root_orient"], body_pose,
                        variables["betas"], verts=mode)
    pred["latent_pose"] = variables["latent_pose"]
    pred["betas"] = variables["betas"]
    return pred, body_pose


def make_runner(cfg: TTOConfig, models: TTOModels, mesh=None,
                fuse: Optional[bool] = None):
    """Build a reusable TTO runner: every stage program is jitted ONCE and
    reused across observation batches (the reference rebuilds optimizers
    and re-traces closures per batch; here consecutive video windows hit
    the compile cache). Returns `run(observed) -> TTOResult`.

    The observation dict's key set is static per runner (it selects which
    energies exist in the compiled graphs); values are traced arguments.

    With `fuse` (the default), the ENTIRE pipeline — variable init, all
    three stages, the stage-3 sub-phases, the per-stage exports, and the
    final rollout — is ONE jitted program: one device dispatch per
    observation batch, no eager between-stage ops, and XLA manages every
    intermediate buffer. An interleaved A/B on the TPU chip measured the
    fused program ~10% faster than the per-stage programs (median
    1.37 s vs 1.53 s on the flagship workload in the same process —
    jax's async dispatch already pipelines per-stage programs, so the
    win is the removed eager exports + whole-module scheduling, not
    dispatch latency). `fuse=False` (env HUMOR_TTO_FUSE=0, or
    HUMOR_TTO_TIMINGS=1) keeps one program per stage, which reports
    per-stage wall-clock and donates stage buffers.

    With `mesh` (a 1-D 'dp' jax Mesh), the window batch dimension shards
    across devices over ICI: parallel sub-sequences optimize on separate
    chips and the overlap-consistency terms (which index across the batch
    axis) lower to XLA collective-permutes — the TPU-native replacement
    for the reference's sequential window chaining (SURVEY.md §2.9).
    """
    import os as _os
    if fuse is None:
        fuse = _os.environ.get("HUMOR_TTO_FUSE", "1") == "1"
    T = cfg.seq_len
    w1, w2, w3 = cfg.stage_weights

    def _lbfgs(loss_fn, vars_, iters, observed, mask=None, stage=0):
        B = batch_size_of(observed)
        # the K*B <= 128 MXU-row rationale is PER DEVICE: under a dp mesh
        # each chip sees B // mesh.size windows, so both the auto
        # line-search crossover and the auto candidate count key off the
        # per-device batch (advisor finding, round 3)
        B_dev = max(1, B // mesh.size) if mesh is not None else B
        linesearch = cfg.lbfgs_linesearch
        if isinstance(linesearch, (tuple, list)):
            linesearch = linesearch[stage]  # per-stage override
        if linesearch == "auto":
            # measured crossover (RESULTS.md "line-search choice by
            # batch"): parallel 13% faster at B=2, armijo 38% at B=16.
            # A per-stage mixed policy (armijo for the per-frame stages)
            # was 4.5% faster still but REGRESSED knee-seed stage-3
            # accuracy ~2x (weaker stage-2 minima feed the stage-3 init)
            # — measured and rejected; see the same RESULTS section.
            linesearch = "parallel" if B_dev < 12 else "armijo"

        def _run(ls, v, n):
            return run_lbfgs(loss_fn, v, n, observed, mask=mask,
                             history_size=cfg.lbfgs_history,
                             max_linesearch_steps=cfg.lbfgs_max_linesearch,
                             linesearch=ls,
                             num_candidates=resolve_candidates(
                                 cfg.lbfgs_candidates, B_dev),
                             tol_grad=cfg.lbfgs_tol_grad,
                             tol_change=cfg.lbfgs_tol_change,
                             stall_patience=cfg.lbfgs_stall_patience)

        if linesearch == "hybrid":
            # speculative-parallel bulk, then a short sequential zoom
            # polish from the bulk's best iterate: zoom's careful
            # bracketing escapes the flat regions the discrete candidate
            # grid wanders on hard seeds (RESULTS.md "convergence early
            # exit" measured zoom reaching 0.39 where parallel sat at
            # 0.56) at ~6-8x the per-iteration cost — a tail of
            # lbfgs_polish_frac keeps the total within ~1.5x.
            polish = (max(2, int(round(iters * cfg.lbfgs_polish_frac)))
                      if iters > 4 else 0)
            res = _run("parallel", vars_, iters - polish)
            if polish == 0:
                return res
            res2 = _run("zoom", res.params, polish)
            return res2._replace(loss_history=jnp.concatenate(
                [res.loss_history, res2.loss_history]))
        return _run(linesearch, vars_, iters)

    # ---- stage 2 loss (stage 1's loss lives in _stage1_body: its
    # frozen pose/betas admit a skin-once rigid fast path)
    def stage2_loss(v, observed):
        pred, _ = _stage12_pred(models, v, observed)
        loss, _ = E.smpl_fit(cfg.energy, w2, observed, pred, T)
        return loss

    def _cam2prior_of(v):
        if not cfg.optim_floor:
            return None
        # compute_cam2prior reads only frame-0 joints; the reference
        # (motion_optimizer.py:520-525) skins ALL T frames per closure
        # eval and indexes [:,0] — decode + skin just frame 0 instead
        # (one of the ~5 VPoser/SMPL passes per stage-3 evaluation)
        bp0 = vp.latent2pose(models.vposer_cfg, models.vposer,
                             v["latent_pose"][:, :1])
        cam_smpl = smpl_results(models.body, v["trans"][:, :1],
                                v["root_orient"][:, :1], bp0,
                                v["betas"], verts="none")
        return geo.compute_cam2prior(
            v["floor_plane"], v["trans"][:, 0], v["root_orient"][:, 0],
            cam_smpl["joints3d"][:, 0])

    def stage3_loss_fn(weights: E.StageWeights, nsteps: int,
                       init_motion_scale: float):
        """Stage-3 objective over the first `nsteps` frames (static)."""
        def loss(v, observed):
            c2p = _cam2prior_of(v)
            zm = v["latent_motion"][:, : nsteps - 1]
            prior_out, cam_out = rollout_latent_motion(
                cfg, models, v, zm, cam2prior=c2p)
            mode = verts_mode_for(observed)
            pred = smpl_results(models.body, prior_out["trans"],
                                prior_out["root_orient"],
                                prior_out["pose_body"], v["betas"],
                                verts=mode)
            pred["latent_pose"] = vp.pose2latent(
                models.vposer_cfg, models.vposer, prior_out["pose_body"])
            pred["betas"] = v["betas"]
            pred["latent_motion"] = zm
            pred["joints_vel"] = v["joints_vel"]
            pred["trans_vel"] = v["trans_vel"]
            pred["root_orient_vel"] = v["root_orient_vel"]
            pred["joints3d_rollout"] = prior_out["joints"]
            if "contacts_conf" in prior_out:
                pred["contacts_conf"] = prior_out["contacts_conf"]

            if cfg.optim_floor:
                # The camera-frame prediction is an EXACT rigid map of
                # the prior-frame prediction: SMPL composes the root
                # orientation about the shaped rest root joint j0, so
                # the cam2prior-inverse parameters (trans_c = R^T(trans
                # - trans[:,0]) - t, orient_c = R^T orient) move every
                # body point by p_cam = R^T(p - trans[:,0] - j0) + j0
                # - t. The reference instead re-skins the whole body in
                # the camera frame every closure eval
                # (motion_optimizer.py:580-585, a second smpl_results on
                # cur_cam_trans/cur_cam_root_orient) — one of the two
                # full-T LBS passes per evaluation, removed here.
                # Parity pin:
                # tests/test_tto_rgb.py::test_cam_frame_rigid_map.
                R, t, _rh = c2p
                j0 = smpl_lib.rest_root_joint(models.body, v["betas"])
                shift = (prior_out["trans"][:, 0] + j0)[:, None, None]
                off = (j0 - t)[:, None, None]

                def _to_cam(p):
                    q = jnp.einsum("bji,btnj->btni", R, p - shift,
                                   precision=jax.lax.Precision.HIGHEST)
                    return q + off

                cam_pred = {k: _to_cam(pred[k]) for k in
                            ("joints3d", "joints3d_extra", "verts3d",
                             "points3d") if k in pred}
                cam_pred["latent_pose"] = pred["latent_pose"]
                cam_pred["betas"] = v["betas"]
                cam_pred["floor_plane"] = v["floor_plane"]
            else:
                cam_pred = pred

            obs = slice_observations(observed, nsteps)

            cond = (prior_out["cond_prior"]
                    if models.humor_cfg.conditional_prior else None)
            total, _ = E.motion_fit(
                cfg.energy, weights, obs, pred, cam_pred, nsteps,
                gmm=models.init_gmm, cond_prior=cond,
                init_motion_scale=init_motion_scale)
            return total
        return loss

    n_init = min(cfg.stage3_tune_init_num_frames, T)
    scale = float(T) / n_init
    iters = cfg.num_iters[2]
    f0 = min(cfg.stage3_freeze_start, iters)
    f1 = min(cfg.stage3_freeze_end, iters)
    freeze_keys = ("trans", "root_orient", "latent_pose", "trans_vel",
                   "joints_vel", "root_orient_vel")

    # ---- stage bodies (masks are static per program). Each body is a
    # pure traced function; the unfused path jits each one (donating the
    # incoming variable pytree so XLA reuses buffers in place), and the
    # fused path inlines them all into one program.
    def _stage1_body(vars_, observed):
        mask = make_mask(vars_, lambda k: k in ("trans", "root_orient"))
        # Stage 1 optimizes ONLY the root (reference root_fit,
        # fitting_loss.py:96-181; stage-1 loop motion_optimizer.py:
        # 214-254 with body pose frozen): pose and betas never change,
        # so the per-iteration VPoser decode + full-T LBS pass is
        # loop-invariant up to the root rigid transform. Skin ONCE with
        # an identity root at zero trans; every closure evaluation (and
        # every line-search candidate) then applies the SMPL root
        # identity p = R_root (base - j0) + j0 + trans — the same
        # algebra as the camera-frame rigid map, pinned by
        # tests/test_tto.py::test_stage1_rigid_pred_matches_lbs.
        bp = vp.latent2pose(models.vposer_cfg, models.vposer,
                            vars_["latent_pose"])
        mode = verts_mode_for(observed)
        base = smpl_results(models.body, jnp.zeros_like(vars_["trans"]),
                            jnp.zeros_like(vars_["root_orient"]), bp,
                            vars_["betas"], verts=mode)
        j0 = smpl_lib.rest_root_joint(models.body, vars_["betas"])
        j0b = j0[:, None, None]
        base_pts = {k: base[k] - j0b for k in
                    ("joints3d", "joints3d_extra", "verts3d", "points3d")
                    if k in base}

        def loss(v, observed):
            R = transforms.aa_to_rotmat(v["root_orient"])  # (B, T, 3, 3)
            off = j0b + v["trans"][:, :, None]
            pred = {k: jnp.einsum(
                        "btij,btnj->btni", R, p,
                        precision=jax.lax.Precision.HIGHEST) + off
                    for k, p in base_pts.items()}
            l, _ = E.root_fit(cfg.energy, w1, observed, pred)
            return l

        return _lbfgs(loss, vars_, cfg.num_iters[0], observed,
                      mask=mask, stage=0)

    def _stage2_body(vars_, observed):
        mask = make_mask(vars_, lambda k: k != "floor_plane")
        return _lbfgs(stage2_loss, vars_, cfg.num_iters[1], observed,
                      mask=mask, stage=1)

    stage1_step = jax.jit(_stage1_body, donate_argnums=(0,))
    stage2_step = jax.jit(_stage2_body, donate_argnums=(0,))

    def _stage3_setup_body(vars_, observed):
        """cam2prior + latent-motion inference + velocity estimation +
        variable shrink, all in one program (reference :337-404)."""
        B = vars_["trans"].shape[0]
        body_pose = vp.latent2pose(models.vposer_cfg, models.vposer,
                                   vars_["latent_pose"])
        vel_trans, vel_root = vars_["trans"], vars_["root_orient"]
        if cfg.optim_floor:
            c2p = _cam2prior_of(vars_)
            R, t, rh = c2p
            pr = geo.apply_cam2prior(
                vel_trans, vel_root, R, t, rh,
                jnp.zeros((B,), jnp.int32),
                smpl_root_joint_fn=lambda tr, ro: smpl_results(
                    models.body, tr, ro, body_pose,
                    vars_["betas"], verts="none")["joints3d"][..., 0, 2])
            vel_trans, vel_root = pr["trans"], pr["root_orient"]

        latent_motion = infer_latent_motion(
            models, vel_trans, vel_root, body_pose, vars_["betas"],
            cfg.data_fps)
        trans_vel, joints_vel, root_orient_vel = estimate_velocities(
            models.body, vel_trans, vel_root, body_pose, vars_["betas"],
            cfg.data_fps)
        s3 = {
            "trans": vars_["trans"][:, :1],
            "root_orient": vars_["root_orient"][:, :1],
            "latent_pose": vars_["latent_pose"][:, :1],
            "betas": vars_["betas"],
            "latent_motion": latent_motion,
            "trans_vel": trans_vel[:, :1],
            "joints_vel": joints_vel[:, :1],
            "root_orient_vel": root_orient_vel[:, :1],
        }
        if cfg.optim_floor:
            s3["floor_plane"] = vars_["floor_plane"]
        return s3

    stage3_setup = jax.jit(_stage3_setup_body, donate_argnums=(0,))

    if cfg.stage3_tune_init_state:
        wA = replace(w3, rgb_overlap_consist=0.0)
        wB = (replace(w3, contact_vel=0.0, contact_height=0.0)
              if cfg.stage3_contact_refine_only else w3)

        def _phaseA_body(vars_, observed):
            return _lbfgs(stage3_loss_fn(wA, n_init, 1.0), vars_, f0,
                          observed, mask=make_mask(vars_, lambda k: True),
                          stage=2)

        def _phaseB_body(vars_, observed):
            return _lbfgs(stage3_loss_fn(wB, T, scale), vars_, f1 - f0,
                          observed,
                          mask=make_mask(vars_,
                                         lambda k: k not in freeze_keys),
                          stage=2)

        def _phaseC_body(vars_, observed):
            return _lbfgs(stage3_loss_fn(w3, T, scale), vars_,
                          iters - f1, observed,
                          mask=make_mask(vars_, lambda k: True), stage=2)

        stage3_phase_bodies = (_phaseA_body, _phaseB_body, _phaseC_body)
    else:
        def _stage3_single_body(vars_, observed):
            return _lbfgs(stage3_loss_fn(w3, T, 1.0), vars_, iters,
                          observed, mask=make_mask(vars_, lambda k: True),
                          stage=2)

        stage3_phase_bodies = (_stage3_single_body,)

    stage3_phases = tuple(jax.jit(b, donate_argnums=(0,))
                          for b in stage3_phase_bodies)

    def _final_rollout_body(vars_):
        c2p = _cam2prior_of(vars_)
        return rollout_latent_motion(cfg, models, vars_,
                                     vars_["latent_motion"], cam2prior=c2p)

    final_rollout = jax.jit(_final_rollout_body)

    def _assemble_final(s3_vars, prior_out, cam_out):
        final = {
            "trans": cam_out["trans"],
            "root_orient": cam_out["root_orient"],
            "pose_body": cam_out["pose_body"],
            "betas": s3_vars["betas"],
            "latent_motion": s3_vars["latent_motion"],
            "latent_pose": vp.pose2latent(
                models.vposer_cfg, models.vposer, cam_out["pose_body"]),
            "prior_trans": prior_out["trans"],
            "prior_root_orient": prior_out["root_orient"],
            "joints3d_rollout": prior_out["joints"],
        }
        if "contacts" in prior_out:
            final["contacts"] = prior_out["contacts"]
        if cfg.optim_floor:
            final["floor_plane"] = geo.parse_floor_plane(
                s3_vars["floor_plane"])
        return final

    def _pipeline(observed):
        """The ENTIRE 3-stage fit as one traced program (fused path)."""
        B = batch_size_of(observed)
        variables = init_variables(cfg, models, B, observed)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P("dp"))
            variables = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, sh)
                if hasattr(x, "ndim") and x.ndim > 0 else x, variables)
        per_stage: Dict[str, Dict] = {}
        losses: Dict[str, jnp.ndarray] = {}

        res1 = _stage1_body(variables, observed)
        losses["stage1"] = res1.loss_history
        per_stage["stage1"] = _export_stage(res1.params, models)

        res2 = _stage2_body(res1.params, observed)
        losses["stage2"] = res2.loss_history
        per_stage["stage2"] = _export_stage(res2.params, models)

        s3_vars = _stage3_setup_body(res2.params, observed)
        s3_losses = []
        for body in stage3_phase_bodies:
            res = body(s3_vars, observed)
            s3_vars = res.params
            s3_losses.append(res.loss_history)
        losses["stage3"] = jnp.concatenate(s3_losses)

        prior_out, cam_out = _final_rollout_body(s3_vars)
        final = _assemble_final(s3_vars, prior_out, cam_out)
        per_stage["stage3"] = {k: final[k] for k in
                               ("trans", "root_orient", "pose_body",
                                "betas")}
        return TTOResult(final=final, per_stage=per_stage, losses=losses)

    fused_run = jax.jit(_pipeline)

    def _init_body(observed):
        # One program instead of eager per-op dispatch: the RGB depth
        # init (_init_z_from_bones: VPoser decode + joints-only LBS +
        # bone-ratio algebra) costs ~0.6 s/fit as ~30 eager dispatches
        # over this image's tunneled link, ~nothing fused.
        return init_variables(cfg, models, batch_size_of(observed),
                              observed)

    init_step = jax.jit(_init_body)

    def _shard(tree, batch_axis=True):
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("dp") if batch_axis else P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh)
            if hasattr(x, "ndim") and x.ndim > 0 else x, tree)

    def run(observed: Dict[str, jnp.ndarray]) -> TTOResult:
        """Execute the 3 stages on one observation batch."""
        import os as _os
        import time as _time
        _timing = bool(_os.environ.get("HUMOR_TTO_TIMINGS"))
        _marks = []

        def _mark(label, leaf):
            if _timing:
                jax.block_until_ready(leaf)
                _marks.append((label, _time.perf_counter()))

        _mark("start", observed)
        if mesh is not None:
            # window batch shards over devices; cross-batch carries are
            # replicated (they have no batch dim)
            sharded = {}
            for k, v in observed.items():
                sharded[k] = _shard(v, batch_axis=(
                    k != "prev_batch_overlap_res"))
            observed = sharded

        if fuse and not _timing:
            return fused_run(observed)

        variables = _shard(init_step(observed))
        per_stage: Dict[str, Dict] = {}
        losses: Dict[str, jnp.ndarray] = {}

        _mark("init", variables["trans"])

        res1 = stage1_step(variables, observed)
        variables = res1.params
        losses["stage1"] = res1.loss_history
        per_stage["stage1"] = _export_stage(variables, models)
        _mark("stage1", variables["trans"])

        res2 = stage2_step(variables, observed)
        variables = res2.params
        losses["stage2"] = res2.loss_history
        per_stage["stage2"] = _export_stage(variables, models)
        _mark("stage2", variables["trans"])

        s3_vars = stage3_setup(variables, observed)
        _mark("stage3_setup", s3_vars["latent_motion"])
        s3_losses = []
        for i, phase in enumerate(stage3_phases):
            res = phase(s3_vars, observed)
            s3_vars = res.params
            s3_losses.append(res.loss_history)
            _mark(f"stage3_phase{i}", s3_vars["latent_motion"])
        losses["stage3"] = jnp.concatenate(s3_losses)

        prior_out, cam_out = final_rollout(s3_vars)
        _mark("final_rollout", prior_out["trans"])
        if _timing:
            import json as _json
            import sys as _sys
            segs = {b[0]: round(b[1] - a[1], 4)
                    for a, b in zip(_marks, _marks[1:])}
            print("[tto timings] " + _json.dumps(segs), file=_sys.stderr)
        final = _assemble_final(s3_vars, prior_out, cam_out)
        per_stage["stage3"] = {k: final[k] for k in
                               ("trans", "root_orient", "pose_body",
                                "betas")}
        return TTOResult(final=final, per_stage=per_stage, losses=losses)

    return run


def run(cfg: TTOConfig, models: TTOModels,
        observed: Dict[str, jnp.ndarray]) -> TTOResult:
    """One-shot convenience wrapper around make_runner."""
    return make_runner(cfg, models)(observed)


def _export_stage(variables, models):
    body_pose = vp.latent2pose(models.vposer_cfg, models.vposer,
                               variables["latent_pose"])
    # copy pass-throughs: the NEXT stage program donates `variables`, so
    # exported snapshots must not alias its buffers
    return {
        "trans": jnp.array(variables["trans"], copy=True),
        "root_orient": jnp.array(variables["root_orient"], copy=True),
        "pose_body": body_pose,
        "betas": jnp.array(variables["betas"], copy=True),
    }
