"""Fitting energy library: every term of the 3-stage TTO objective.

Behavioral parity target: /root/reference/humor/fitting/fitting_loss.py
(FittingLoss: root_fit :96, smpl_fit :183, motion_fit :227, individual
energies :330-484). New jnp implementation, TPU-first:

  * observations carry inf-sentinel visibility masks (static shapes);
    invisible entries are zeroed with `where`, never boolean-indexed;
  * per-stage weights are static Python floats — a zero weight removes
    the term from the compiled graph entirely;
  * the within-batch overlap-consistency coupling uses masked `jnp.roll`
    alignment instead of the reference's per-pair Python loop
    (fitting_loss.py:136-179), so variable overlap lengths never
    recompile;
  * everything composes under jit/grad inside the L-BFGS closures.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.fitting import geometry as geo
from humor_tpu.fitting import robust as rob
from humor_tpu.models import gmm as gmm_lib
from humor_tpu.ops import chamfer

_HI = jax.lax.Precision.HIGHEST

CONTACT_HEIGHT_THRESH = 0.08  # reference fitting_loss.py:18

# Observation keys whose axis 1 is time (sliceable to a stage-3
# sub-window). Everything else (floor_plane, cam_f, cam_center,
# seq_interval, prev_batch_overlap_res, ...) is per-window metadata and
# must pass through unsliced regardless of its shape.
TIME_INDEXED_OBS_KEYS = frozenset(
    {"joints3d", "verts3d", "points3d", "joints2d"})


@dataclass(frozen=True)
class StageWeights:
    """Loss weights for one optimization stage (static — baked into the
    jitted stage program). Defaults are all-off; configs set them
    (reference fitting/config.py:60-74 NSTAGES-length weight lists)."""

    joints3d: float = 0.0
    joints3d_rollout: float = 0.0
    verts3d: float = 0.0
    points3d: float = 0.0
    joints2d: float = 0.0
    pose_prior: float = 0.0
    shape_prior: float = 0.0
    motion_prior: float = 0.0
    init_motion_prior: float = 0.0
    joint_consistency: float = 0.0
    bone_length: float = 0.0
    joints3d_smooth: float = 0.0
    contact_vel: float = 0.0
    contact_height: float = 0.0
    floor_reg: float = 0.0
    rgb_overlap_consist: float = 0.0


@dataclass(frozen=True)
class EnergyConfig:
    """Static configuration shared by all stages."""

    robust_loss: str = "none"           # for points3d: 'none' | 'bisquare'
    robust_tuning_const: float = rob.BISQUARE_TUNE_CONST
    joints2d_sigma: float = 100.0
    smpl2op_map: Optional[Tuple[int, ...]] = None
    ignore_op_joints: Tuple[int, ...] = tuple(C.OP_IGNORE_JOINTS)


def visible_mask(obs: jnp.ndarray) -> jnp.ndarray:
    """Inf-sentinel visibility: True where the observation contributes."""
    return jnp.logical_not(jnp.isinf(obs))


def _masked_l2(obs: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    mask = visible_mask(obs)
    diff = jnp.where(mask, obs - pred, 0.0)
    return 0.5 * jnp.sum(jnp.square(diff))


def joints3d_loss(obs: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Visibility-masked 3D joint L2 (reference :360-364)."""
    return _masked_l2(obs, pred)


def verts3d_loss(obs: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    return _masked_l2(obs, pred)


def joints3d_smooth_loss(pred: jnp.ndarray) -> jnp.ndarray:
    """0.5*sum of squared per-step joint deltas (reference :366-370)."""
    return 0.5 * jnp.sum(jnp.square(pred[:, 1:] - pred[:, :-1]))


def points3d_loss(cfg: EnergyConfig, obs: jnp.ndarray, pred: jnp.ndarray
                  ) -> jnp.ndarray:
    """One-way chamfer (observed cloud -> predicted mesh verts) with
    robust weighting on the *distances* (reference :378-396).
    obs (B, T, N, 3) may contain inf padding; padded points are pushed far
    away and their weighted residuals masked out."""
    B, T, N, _ = obs.shape
    mask = visible_mask(obs[..., 0])  # (B, T, N)
    obs_safe = jnp.where(visible_mask(obs), obs, 1e6)
    o = obs_safe.reshape(B * T, N, 3)
    p = pred.reshape(B * T, -1, 3)
    sqr_dist, _ = chamfer.nn_distance(o, p)      # (B*T, N)
    sqr_dist = sqr_dist.reshape(B, T * N)
    dist = jnp.sqrt(jnp.maximum(sqr_dist, 1e-12))
    flat_mask = mask.reshape(B, T * N)
    # the mask keeps the ~1e6 fake residuals of padded points out of the
    # bisquare MAD scale (else padding inflates the scale / captures the
    # median and outlier rejection silently turns off)
    weighted, _ = rob.apply_robust_weighting(
        dist, cfg.robust_loss, cfg.robust_tuning_const, mask=flat_mask)
    weighted = weighted * flat_mask
    return 0.5 * jnp.sum(weighted)


def joints2d_loss(cfg: EnergyConfig,
                  obs2d: jnp.ndarray,          # (B, T, 25, 3) xy+conf
                  joints3d: jnp.ndarray,       # (B, T, J, 3)
                  joints3d_extra: jnp.ndarray, # (B, T, K, 3)
                  cam_f: jnp.ndarray,          # (B, 2)
                  cam_center: jnp.ndarray,     # (B, 2)
                  ) -> jnp.ndarray:
    """Confidence^2-weighted Geman-McClure reprojection error
    (reference :313-358)."""
    assert cfg.smpl2op_map is not None, "need smpl->openpose map"
    B, T = obs2d.shape[:2]
    full = jnp.concatenate([joints3d, joints3d_extra], axis=2)
    op_joints = full[:, :, np.asarray(cfg.smpl2op_map)]     # (B, T, 25, 3)
    pts = op_joints.reshape(B * T, C.OP_NUM_JOINTS, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), (B * T, 3, 3))
    zero_t = jnp.zeros((B * T, 3), pts.dtype)
    f = jnp.repeat(cam_f, T, axis=0)
    cc = jnp.repeat(cam_center, T, axis=0)
    uv = geo.perspective_projection(pts, eye, zero_t, f, cc)
    uv = uv.reshape(B, T, C.OP_NUM_JOINTS, 2)

    conf = obs2d[..., 2:3]
    if cfg.ignore_op_joints:
        keep = np.ones(C.OP_NUM_JOINTS, np.float32)
        keep[np.asarray(cfg.ignore_op_joints)] = 0.0
        conf = conf * keep[None, None, :, None]
    robust_sq = rob.gmof(uv - obs2d[..., :2], cfg.joints2d_sigma)
    return jnp.sum(jnp.square(conf) * robust_sq)


def pose_prior_loss(latent_pose: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.square(latent_pose))


def shape_prior_loss(betas: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.square(betas))


def log_normal(x: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray
               ) -> jnp.ndarray:
    """Elementwise Gaussian log-density summed over the last dim
    (reference :503-517)."""
    lp = (-0.5 * jnp.log(v) - 0.5 * jnp.log(2.0 * jnp.pi)
          - jnp.square(x - m) / (2.0 * v))
    return jnp.sum(lp, axis=-1)


def motion_prior_loss(latent_motion: jnp.ndarray,
                      cond_prior: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                      = None) -> jnp.ndarray:
    """-log N(z; mu, sigma) under the conditional prior, or ||z||^2 under
    a standard normal (reference :404-414)."""
    if cond_prior is None:
        return jnp.sum(jnp.square(latent_motion))
    pm, pv = cond_prior
    return -jnp.sum(log_normal(latent_motion, pm, pv))


def init_motion_prior_loss(gmm: gmm_lib.GmmParams,
                           joints: jnp.ndarray,       # (B, 1, J, 3)
                           joints_vel: jnp.ndarray,   # (B, 1, J, 3)
                           trans_vel: jnp.ndarray,    # (B, 1, 3)
                           root_orient_vel: jnp.ndarray  # (B, 1, 3)
                           ) -> jnp.ndarray:
    """GMM NLL of the 138-d initial state (reference :416-429)."""
    B = joints.shape[0]
    state = jnp.concatenate(
        [joints.reshape(B, -1), joints_vel.reshape(B, -1),
         trans_vel.reshape(B, -1), root_orient_vel.reshape(B, -1)], axis=-1)
    return -jnp.sum(gmm_lib.log_prob(gmm, state))


def joint_consistency_loss(smpl_joints: jnp.ndarray,
                           rollout_joints: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * jnp.sum(jnp.square(smpl_joints - rollout_joints))


def bone_length_loss(rollout_joints: jnp.ndarray) -> jnp.ndarray:
    """Temporal bone-length consistency over the kinematic tree
    (reference :436-442). rollout_joints (B, T, J, 3)."""
    parents = np.asarray(C.SMPL_PARENTS[1:])
    bones = rollout_joints[:, :, 1:]
    par = rollout_joints[:, :, parents]
    lengths = jnp.linalg.norm(bones - par, axis=-1)
    diff = lengths[:, 1:] - lengths[:, :-1]
    return 0.5 * jnp.sum(jnp.square(diff))


def contact_vel_loss(contacts_conf: jnp.ndarray,  # (B, T, J)
                     joints3d: jnp.ndarray        # (B, T, J, 3)
                     ) -> jnp.ndarray:
    """Zero joint velocity where contact is predicted (reference :450-457)."""
    delta_sq = jnp.sum(jnp.square(joints3d[:, 1:] - joints3d[:, :-1]),
                       axis=-1)
    return 0.5 * jnp.sum(delta_sq * contacts_conf[:, 1:])


def contact_height_loss(contacts_conf: jnp.ndarray,
                        joints3d: jnp.ndarray) -> jnp.ndarray:
    """Contacting joints near the z=0 floor (reference :459-468)."""
    floor_diff = jax.nn.relu(jnp.abs(joints3d[..., 2])
                             - CONTACT_HEIGHT_THRESH)
    return jnp.sum(floor_diff * contacts_conf)


def floor_reg_loss(pred_floor3: jnp.ndarray, obs_floor4: jnp.ndarray
                   ) -> jnp.ndarray:
    """Predicted 3d floor close to observed 4d floor (reference :470-484)."""
    obs3 = obs_floor4[..., :3] * obs_floor4[..., 3:]
    return 0.5 * jnp.sum(jnp.square(pred_floor3 - obs3))


# ---------------------------------------------------------------------------
# Overlap consistency (sub-sequence coupling for long videos)
# ---------------------------------------------------------------------------

def _masked_overlap_l2(prev_seq: jnp.ndarray, cur_seq: jnp.ndarray,
                       overlap: jnp.ndarray, with_vel: bool
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum-of-squares agreement between the last `overlap` frames of
    prev_seq and the first `overlap` frames of cur_seq, each (T, ...).
    `overlap` is traced — alignment by roll + mask, so one compiled graph
    serves all overlap lengths."""
    T = prev_seq.shape[0]
    t_idx = jnp.arange(T)
    aligned_prev = jnp.roll(prev_seq, overlap, axis=0)   # [i] = prev[T-o+i]
    m = (t_idx < overlap).astype(prev_seq.dtype)
    m = m.reshape((T,) + (1,) * (prev_seq.ndim - 1))
    pos = 0.5 * jnp.sum(jnp.square((aligned_prev - cur_seq) * m))

    vel = jnp.zeros((), prev_seq.dtype)
    if with_vel and T > 1:
        dprev = prev_seq[1:] - prev_seq[:-1]
        dcur = cur_seq[1:] - cur_seq[:-1]
        aligned_dprev = jnp.roll(dprev, overlap - 1, axis=0)
        mv = (jnp.arange(T - 1) < overlap - 1).astype(prev_seq.dtype)
        mv = mv.reshape((T - 1,) + (1,) * (prev_seq.ndim - 1))
        vel = 0.5 * jnp.sum(jnp.square((aligned_dprev - dcur) * mv))
    return pos, vel


def overlap_consist_loss(verts3d: jnp.ndarray,       # (B, T, V, 3)
                         seq_interval: jnp.ndarray,  # (B, 2) int
                         ) -> jnp.ndarray:
    """Within-batch consecutive-window agreement: position + velocity of
    predicted keypoint verts over the overlapping frames
    (reference :136-158)."""
    B = verts3d.shape[0]
    if B < 2:
        return jnp.zeros((), verts3d.dtype)
    overlaps = seq_interval[:-1, 1] - seq_interval[1:, 0]  # (B-1,)
    pos, vel = jax.vmap(
        lambda p, c, o: _masked_overlap_l2(p, c, o, with_vel=True)
    )(verts3d[:-1], verts3d[1:], overlaps)
    return jnp.sum(pos) + jnp.sum(vel)


def xbatch_overlap_loss(verts3d_first: jnp.ndarray,   # (T, V, 3) window 0
                        prev_verts3d: jnp.ndarray,    # (Tp, V, 3) last prev
                        overlap: jnp.ndarray,         # () int
                        ) -> jnp.ndarray:
    """Cross-batch version: window 0 of this batch vs the cached last
    window of the previous batch (reference :159-179). Sequence lengths
    may differ (stage-3 15-frame sub-window) — the mask handles it."""
    Tp, T = prev_verts3d.shape[0], verts3d_first.shape[0]
    t_idx = jnp.arange(T)
    # cur frame i is the same global instant as prev frame Tp-overlap+i;
    # that unclamped correspondence is kept, and the mask restricts to
    # the rows where it is in range: i < min(overlap, T) (upper) AND
    # i >= overlap - Tp (lower — relevant when overlap exceeds the prev
    # window length, e.g. a short stage-3 sub-window cache). The clip
    # below therefore never lands on a masked-in row.
    ov = jnp.minimum(overlap, T)
    gather_idx = jnp.clip(Tp - overlap + t_idx, 0, Tp - 1)
    aligned_prev = prev_verts3d[gather_idx]
    valid = jnp.logical_and(t_idx < ov, t_idx >= overlap - Tp)
    m = valid.astype(verts3d_first.dtype)
    m = m.reshape((T,) + (1,) * (verts3d_first.ndim - 1))
    pos = 0.5 * jnp.sum(jnp.square((aligned_prev - verts3d_first) * m))
    vel = jnp.zeros((), verts3d_first.dtype)
    if T > 1:
        dprev = aligned_prev[1:] - aligned_prev[:-1]
        dcur = verts3d_first[1:] - verts3d_first[:-1]
        v_idx = jnp.arange(T - 1)
        mv = jnp.logical_and(v_idx < ov - 1, v_idx >= overlap - Tp
                             ).astype(verts3d_first.dtype)
        mv = mv.reshape((T - 1,) + (1,) * (verts3d_first.ndim - 1))
        vel = 0.5 * jnp.sum(jnp.square((dprev - dcur) * mv))
    return pos + vel


# ---------------------------------------------------------------------------
# Stage objectives
# ---------------------------------------------------------------------------

def root_fit(cfg: EnergyConfig, w: StageWeights,
             observed: Dict[str, jnp.ndarray],
             pred: Dict[str, jnp.ndarray],
             cam: Optional[Dict[str, jnp.ndarray]] = None,
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Data-term-only objective (stage 1; reference root_fit :96-181)."""
    stats: Dict[str, jnp.ndarray] = {}
    loss = jnp.zeros(())

    if w.joints3d > 0 and "joints3d" in observed:
        stats["joints3d"] = joints3d_loss(observed["joints3d"],
                                          pred["joints3d"])
        loss += w.joints3d * stats["joints3d"]
    if w.verts3d > 0 and "verts3d" in observed:
        stats["verts3d"] = verts3d_loss(observed["verts3d"],
                                        pred["verts3d"])
        loss += w.verts3d * stats["verts3d"]
    if w.points3d > 0 and "points3d" in observed:
        stats["points3d"] = points3d_loss(cfg, observed["points3d"],
                                          pred["points3d"])
        loss += w.points3d * stats["points3d"]
    if (w.joints2d > 0 and "joints2d" in observed
            and "joints3d_extra" in pred):
        stats["joints2d"] = joints2d_loss(
            cfg, observed["joints2d"], pred["joints3d"],
            pred["joints3d_extra"], observed["cam_f"],
            observed["cam_center"])
        loss += w.joints2d * stats["joints2d"]
    if (w.rgb_overlap_consist > 0 and "seq_interval" in observed
            and "verts3d" in pred):
        stats["overlap_verts3d"] = overlap_consist_loss(
            pred["verts3d"], observed["seq_interval"])
        loss += w.rgb_overlap_consist * stats["overlap_verts3d"]
        if "prev_batch_overlap_res" in observed:
            prev = observed["prev_batch_overlap_res"]
            ov = prev["seq_interval"][1] - observed["seq_interval"][0, 0]
            stats["xbatch_verts3d"] = xbatch_overlap_loss(
                pred["verts3d"][0], prev["verts3d"], ov)
            loss += w.rgb_overlap_consist * stats["xbatch_verts3d"]
    return loss, stats


def smpl_fit(cfg: EnergyConfig, w: StageWeights,
             observed: Dict[str, jnp.ndarray],
             pred: Dict[str, jnp.ndarray],
             nsteps: int,
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-2 objective: data + pose/shape priors + smoothness
    (reference smpl_fit :183-225)."""
    loss, stats = root_fit(cfg, w, observed, pred)
    if w.pose_prior > 0 and "latent_pose" in pred:
        stats["pose_prior"] = pose_prior_loss(pred["latent_pose"])
        loss += w.pose_prior * stats["pose_prior"]
    if w.shape_prior > 0 and "betas" in pred:
        stats["shape_prior"] = shape_prior_loss(pred["betas"])
        loss += w.shape_prior * nsteps * stats["shape_prior"]
    if w.joints3d_smooth > 0:
        stats["joints3d_smooth"] = joints3d_smooth_loss(pred["joints3d"])
        loss += w.joints3d_smooth * stats["joints3d_smooth"]
    if (w.rgb_overlap_consist > 0 and "seq_interval" in observed
            and "betas" in pred):
        beta_loss = joints3d_loss(pred["betas"][:-1], pred["betas"][1:])
        stats["overlap_betas"] = beta_loss
        loss += w.rgb_overlap_consist * beta_loss
        if "prev_batch_overlap_res" in observed:
            prev = observed["prev_batch_overlap_res"]
            xb = joints3d_loss(pred["betas"][0], prev["betas"])
            stats["xbatch_betas"] = xb
            loss += w.rgb_overlap_consist * xb
    return loss, stats


def motion_fit(cfg: EnergyConfig, w: StageWeights,
               observed: Dict[str, jnp.ndarray],
               pred: Dict[str, jnp.ndarray],
               cam_pred: Dict[str, jnp.ndarray],
               nsteps: int,
               gmm: Optional[gmm_lib.GmmParams] = None,
               cond_prior: Optional[Tuple] = None,
               init_motion_scale: float = 1.0,
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-3 objective: stage-2 terms in the camera frame + motion/init
    priors + consistency/contact terms in the prior frame
    (reference motion_fit :227-308)."""
    loss, stats = smpl_fit(cfg, w, observed, cam_pred, nsteps)

    if w.motion_prior > 0 and "latent_motion" in pred:
        stats["motion_prior"] = motion_prior_loss(pred["latent_motion"],
                                                  cond_prior)
        loss += w.motion_prior * stats["motion_prior"]
    if (w.init_motion_prior > 0 and gmm is not None
            and "joints_vel" in pred):
        stats["init_motion_prior"] = init_motion_prior_loss(
            gmm, pred["joints3d"][:, 0:1], pred["joints_vel"],
            pred["trans_vel"], pred["root_orient_vel"])
        loss += (w.init_motion_prior * init_motion_scale
                 * stats["init_motion_prior"])
    if w.joint_consistency > 0 and "joints3d_rollout" in pred:
        stats["joint_consistency"] = joint_consistency_loss(
            pred["joints3d"], pred["joints3d_rollout"])
        loss += w.joint_consistency * stats["joint_consistency"]
    if w.bone_length > 0 and "joints3d_rollout" in pred:
        stats["bone_length"] = bone_length_loss(pred["joints3d_rollout"])
        loss += w.bone_length * stats["bone_length"]
    if (w.joints3d_rollout > 0 and "joints3d" in observed
            and "joints3d_rollout" in pred):
        stats["joints3d_rollout"] = joints3d_loss(
            observed["joints3d"], pred["joints3d_rollout"])
        loss += w.joints3d_rollout * stats["joints3d_rollout"]
    if w.contact_vel > 0 and "contacts_conf" in pred:
        stats["contact_vel"] = contact_vel_loss(pred["contacts_conf"],
                                                pred["joints3d"])
        loss += w.contact_vel * stats["contact_vel"]
    if w.contact_height > 0 and "contacts_conf" in pred:
        stats["contact_height"] = contact_height_loss(
            pred["contacts_conf"], pred["joints3d"])
        loss += w.contact_height * stats["contact_height"]
    if (w.floor_reg > 0 and "floor_plane" in cam_pred
            and "floor_plane" in observed):
        stats["floor_reg"] = floor_reg_loss(cam_pred["floor_plane"],
                                            observed["floor_plane"])
        loss += w.floor_reg * nsteps * stats["floor_reg"]
    if (w.rgb_overlap_consist > 0 and "seq_interval" in observed
            and "floor_plane" in cam_pred):
        fl = joints3d_loss(cam_pred["floor_plane"][:-1],
                           cam_pred["floor_plane"][1:])
        stats["overlap_floor"] = fl
        loss += w.rgb_overlap_consist * fl
        if "prev_batch_overlap_res" in observed:
            prev = observed["prev_batch_overlap_res"]
            xb = floor_reg_loss(cam_pred["floor_plane"][0:1],
                                prev["floor_plane"][None])
            stats["xbatch_floor"] = xb
            loss += w.rgb_overlap_consist * xb
    return loss, stats
