"""AMASS preprocessing: raw mocap npz -> training-ready sequence npz.

Behavioral parity target: /root/reference/humor/scripts/process_amass_data.py
(trim to middle 80% :374-379, chunked SMPL forward :393-414, floor height
+ contacts via velocity/height thresholds and 1-d height clustering
:89-253, terrain-sequence discard :196-206, central-difference velocities
:309-339, 30 Hz downsample :472-507, per-frame world2aligned rot :509-512,
output schema :534-554 with frame count + fps in the filename).

TPU-first: the SMPL forward runs as one jitted batched LBS call per chunk
(the chunking bounds device memory exactly like the reference's
SPLIT_FRAME_LIMIT); everything else is host-side numpy — preprocessing is
offline and IO-bound, not a device workload. The 1-d DBSCAN over static
foot heights is replaced by an equivalent sort-based gap clustering
(same eps semantics in one dimension, no sklearn dependency in the hot
path).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.body_model import smpl as smpl_lib
from humor_tpu.ops import transforms

OUT_FPS = 30
SPLIT_FRAME_LIMIT = 2000
DISCARD_SHORTER_THAN = 1.0  # seconds

FLOOR_VEL_THRESH = 0.005
FLOOR_HEIGHT_OFFSET = 0.01
CONTACT_VEL_THRESH = 0.005
CONTACT_TOE_HEIGHT_THRESH = 0.04
CONTACT_ANKLE_HEIGHT_THRESH = 0.08
TERRAIN_HEIGHT_THRESH = 0.04
ROOT_HEIGHT_THRESH = 0.04
CLUSTER_SIZE_THRESH = 0.25

# split definitions (reference amass_utils.py:5-8 / process_amass_data.py)
TRAIN_DATASETS = ["CMU", "MPI_Limits", "TotalCapture", "Eyes_Japan_Dataset",
                  "KIT", "BioMotionLab_NTroje", "BMLmovi", "EKUT", "ACCAD"]
TEST_DATASETS = ["Transitions_mocap", "HumanEva"]
VAL_DATASETS = ["MPI_HDM05", "SFU", "MPI_mosh"]
ALL_DATASETS = TRAIN_DATASETS + TEST_DATASETS + VAL_DATASETS


def cluster_1d(values: np.ndarray, eps: float = 0.005,
               min_samples: int = 3) -> np.ndarray:
    """DBSCAN-equivalent labels for 1-d data: sort, split where the gap
    between consecutive points exceeds eps, mark clusters smaller than
    min_samples as noise (-1). Matches sklearn DBSCAN(eps, min_samples)
    on 1-d inputs for this use (density chains along a line)."""
    n = values.shape[0]
    labels = np.full(n, -1, np.int64)
    if n == 0:
        return labels
    order = np.argsort(values)
    sv = values[order]
    breaks = np.nonzero(np.diff(sv) > eps)[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks + 1, [n]])
    next_label = 0
    for s, e in zip(starts, ends):
        if e - s >= min_samples:
            labels[order[s:e]] = next_label
            next_label += 1
    return labels


def _joint_vel(joints: np.ndarray, idx: int) -> np.ndarray:
    """Per-frame displacement magnitude of one joint, last value repeated."""
    seq = joints[:, idx]
    vel = np.linalg.norm(seq[1:] - seq[:-1], axis=1)
    return np.append(vel, vel[-1])


def _contact(joints: np.ndarray, name: str, floor_height: float,
             vel_thresh: float, height_thresh: float) -> np.ndarray:
    j = C.SMPL_JOINTS[name]
    vel = _joint_vel(joints, j)
    heights = joints[:, j, 2] - floor_height
    return np.logical_and(vel < vel_thresh, heights < height_thresh)


def determine_floor_height_and_contacts(
    joints: np.ndarray, fps: float,
    discard_terrain: bool = True,
) -> Tuple[float, np.ndarray, bool]:
    """joints (N, 22, 3), z-up -> (floor_height, contacts (N, 22), discard).

    Floor = median of the lowest cluster of static-toe heights; contacts
    are velocity+height thresholds per contact joint
    (reference :89-253)."""
    N = joints.shape[0]
    lt, rt = C.SMPL_JOINTS["leftToeBase"], C.SMPL_JOINTS["rightToeBase"]
    left_toe_vel = _joint_vel(joints, lt)
    right_toe_vel = _joint_vel(joints, rt)
    left_h, right_h = joints[:, lt, 2], joints[:, rt, 2]
    root_h = joints[:, C.SMPL_JOINTS["hips"], 2]

    static_h = np.concatenate([left_h[left_toe_vel < FLOOR_VEL_THRESH],
                               right_h[right_toe_vel < FLOOR_VEL_THRESH]])
    static_i = np.concatenate([
        np.arange(N)[left_toe_vel < FLOOR_VEL_THRESH],
        np.arange(N)[right_toe_vel < FLOOR_VEL_THRESH]])

    discard = False
    if static_h.shape[0] > 0:
        labels = cluster_1d(static_h)
        heights, root_heights, sizes = [], [], []
        for lab in np.unique(labels):
            clust = static_h[labels == lab]
            inds = np.unique(static_i[labels == lab])
            heights.append(np.median(clust))
            root_heights.append(np.median(root_h[inds]))
            sizes.append(clust.shape[0])
        best = int(np.argmin(heights))
        floor_height = heights[best]
        min_root = root_heights[best]
        if discard_terrain:
            for rh, h, sz in zip(root_heights, heights, sizes):
                if (rh > min_root + ROOT_HEIGHT_THRESH
                        and h > floor_height + TERRAIN_HEIGHT_THRESH
                        and sz > int(CLUSTER_SIZE_THRESH * fps)):
                    discard = True
                    break
        offset_floor = floor_height - FLOOR_HEIGHT_OFFSET
    else:
        floor_height = offset_floor = 0.0

    contacts = np.zeros((N, C.NUM_SMPL_JOINTS), np.float64)
    pairs = [
        ("leftFoot", CONTACT_ANKLE_HEIGHT_THRESH),
        ("rightFoot", CONTACT_ANKLE_HEIGHT_THRESH),
        ("leftToeBase", CONTACT_TOE_HEIGHT_THRESH),
        ("rightToeBase", CONTACT_TOE_HEIGHT_THRESH),
        ("leftHand", CONTACT_ANKLE_HEIGHT_THRESH),
        ("rightHand", CONTACT_ANKLE_HEIGHT_THRESH),
        ("leftLeg", CONTACT_ANKLE_HEIGHT_THRESH),
        ("rightLeg", CONTACT_ANKLE_HEIGHT_THRESH),
    ]
    for name, thresh in pairs:
        contacts[:, C.SMPL_JOINTS[name]] = _contact(
            joints, name, floor_height, CONTACT_VEL_THRESH, thresh)
    return offset_floor, contacts, discard


def estimate_velocity(seq: np.ndarray, h: float) -> np.ndarray:
    """Second-order central difference over axis 0: (T, ...) -> (T-2, ...)."""
    return (seq[2:] - seq[:-2]) / (2.0 * h)


def estimate_angular_velocity(rot_seq: np.ndarray, h: float) -> np.ndarray:
    """(T, ..., 3, 3) rotations -> (T-2, ..., 3) angular velocities."""
    dRdt = estimate_velocity(rot_seq, h)
    R = rot_seq[1:-1]
    w_mat = np.matmul(dRdt, np.swapaxes(R, -1, -2))
    w_x = (-w_mat[..., 1, 2] + w_mat[..., 2, 1]) / 2.0
    w_y = (w_mat[..., 0, 2] - w_mat[..., 2, 0]) / 2.0
    w_z = (-w_mat[..., 0, 1] + w_mat[..., 1, 0]) / 2.0
    return np.stack([w_x, w_y, w_z], axis=-1)


def compute_align_mats(root_orient_aa: np.ndarray) -> np.ndarray:
    """Per-frame heading-canonicalizing rotations from aa root orient."""
    R = np.asarray(transforms.aa_to_rotmat(jnp.asarray(
        root_orient_aa.astype(np.float32))))
    return np.asarray(transforms.compute_world2aligned_mat(jnp.asarray(R)))


def compute_joint_align_mats(joints: np.ndarray) -> np.ndarray:
    """Per-frame heading rotations from hip joints (for joint_orient_vel)."""
    return np.asarray(transforms.compute_world2aligned_joints_mat(
        jnp.asarray(joints.astype(np.float32))))


@jax.jit
def _smpl_chunk(model: smpl_lib.SmplModel, root_orient, pose_body, betas,
                trans, pose_hand):
    return smpl_lib.forward(model, root_orient, pose_body, betas, trans,
                            pose_hand=pose_hand)


def smpl_sequence(model: smpl_lib.SmplModel, root_orient: np.ndarray,
                  pose_body: np.ndarray, betas: np.ndarray,
                  trans: np.ndarray, pose_hand: Optional[np.ndarray] = None,
                  chunk: int = SPLIT_FRAME_LIMIT
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Chunked SMPL forward over a (N, ...) sequence -> (joints, keypt
    verts). Chunks are padded to a fixed size so the jit compiles once."""
    N = trans.shape[0]
    nb = betas.shape[-1]
    betas_rep = np.repeat(betas[None, :nb], min(chunk, N), axis=0)
    joints_out, verts_out = [], []
    for s in range(0, N, chunk):
        e = min(N, s + chunk)
        n = e - s
        pad = min(chunk, N) - n

        def _pad(x):
            return np.concatenate([x, np.repeat(x[-1:], pad, 0)]) if pad else x

        ph = (pose_hand[s:e] if pose_hand is not None
              else np.zeros((n, (model.num_joints - C.NUM_SMPL_JOINTS) * 3),
                            np.float32))
        out = _smpl_chunk(
            model,
            jnp.asarray(_pad(root_orient[s:e]), jnp.float32),
            jnp.asarray(_pad(pose_body[s:e]), jnp.float32),
            jnp.asarray(betas_rep, jnp.float32),
            jnp.asarray(_pad(trans[s:e]), jnp.float32),
            jnp.asarray(_pad(ph), jnp.float32),
        )
        joints_out.append(np.asarray(out.Jtr)[:n, :C.NUM_SMPL_JOINTS])
        keypt = [i for i in C.KEYPT_VERTS if i < out.v.shape[1]]
        verts_out.append(np.asarray(out.v)[:n, keypt])
    return np.concatenate(joints_out), np.concatenate(verts_out)


def process_sequence(model: smpl_lib.SmplModel,
                     raw: Dict[str, np.ndarray],
                     num_betas: int = C.BETA_SIZE,
                     out_fps: int = OUT_FPS,
                     discard_terrain: bool = True,
                     ) -> Optional[Dict[str, np.ndarray]]:
    """Raw AMASS arrays {fps, gender, trans, root_orient, pose_body,
    pose_hand, betas} -> processed dict (reference process_seq :341-554),
    or None when the sequence is discarded."""
    fps = float(np.asarray(raw["fps"]))
    trans = np.asarray(raw["trans"], np.float64)
    root_orient = np.asarray(raw["root_orient"], np.float64)
    pose_body = np.asarray(raw["pose_body"], np.float64)
    pose_hand = np.asarray(raw.get("pose_hand"), np.float64) \
        if raw.get("pose_hand") is not None else None
    betas = np.asarray(raw["betas"], np.float64)[:num_betas]
    N = trans.shape[0]

    # middle 80%
    s, e = int(0.1 * N), int(0.9 * N)
    trans, root_orient, pose_body = trans[s:e], root_orient[s:e], pose_body[s:e]
    if pose_hand is not None:
        pose_hand = pose_hand[s:e]
    N = trans.shape[0]
    if N < DISCARD_SHORTER_THAN * fps:
        return None

    joints, verts = smpl_sequence(
        model, root_orient.astype(np.float32), pose_body.astype(np.float32),
        betas.astype(np.float32), trans.astype(np.float32),
        pose_hand.astype(np.float32) if pose_hand is not None else None)
    joints = joints.astype(np.float64)
    verts = verts.astype(np.float64)

    floor_height, contacts, discard = determine_floor_height_and_contacts(
        joints, fps, discard_terrain=discard_terrain)
    if discard:
        return None
    trans[:, 2] -= floor_height
    joints[:, :, 2] -= floor_height
    verts[:, :, 2] -= floor_height

    joints_w2a = compute_joint_align_mats(joints).astype(np.float64)

    h = 1.0 / fps
    joints_vel = estimate_velocity(joints, h)
    verts_vel = estimate_velocity(verts, h)
    trans_vel = estimate_velocity(trans, h)
    root_mat = np.asarray(transforms.aa_to_rotmat(
        jnp.asarray(root_orient.astype(np.float32)))).astype(np.float64)
    root_orient_vel = estimate_angular_velocity(root_mat, h)
    pose_mat = np.asarray(transforms.aa_to_rotmat(jnp.asarray(
        pose_body.reshape(N, -1, 3).astype(np.float32)))).astype(np.float64)
    pose_body_vel = estimate_angular_velocity(pose_mat, h)
    joint_orient_vel = -estimate_angular_velocity(joints_w2a, h)[:, 2]

    # drop edge frames (velocities are defined on the middle T-2)
    N = N - 2
    contacts = contacts[1:-1]
    trans, root_orient, pose_body = trans[1:-1], root_orient[1:-1], pose_body[1:-1]
    joints, verts = joints[1:-1], verts[1:-1]

    # downsample
    if out_fps < fps:
        ratio = float(out_fps) / fps
        new_n = int(ratio * N)
        ds = np.linspace(0, N - 1, num=new_n, dtype=int)
        fps = float(out_fps)
        contacts, trans, root_orient, pose_body = (
            contacts[ds], trans[ds], root_orient[ds], pose_body[ds])
        joints, verts = joints[ds], verts[ds]
        joints_vel, verts_vel, trans_vel = (
            joints_vel[ds], verts_vel[ds], trans_vel[ds])
        root_orient_vel, pose_body_vel = root_orient_vel[ds], pose_body_vel[ds]
        joint_orient_vel = joint_orient_vel[ds]
        N = new_n

    world2aligned_rot = compute_align_mats(root_orient).astype(np.float64)

    return {
        "fps": fps,
        "gender": str(raw.get("gender", "neutral")),
        "floor_height": floor_height,
        "contacts": contacts,
        "trans": trans,
        "root_orient": root_orient,
        "pose_body": pose_body,
        "betas": np.asarray(raw["betas"], np.float64),
        "joints": joints,
        "mojo_verts": verts,
        "joints_vel": joints_vel,
        "mojo_verts_vel": verts_vel,
        "trans_vel": trans_vel,
        "root_orient_vel": root_orient_vel,
        "joint_orient_vel_seq": joint_orient_vel,
        "pose_body_vel": pose_body_vel,
        "world2aligned_rot": world2aligned_rot,
    }


def output_filename(base: str, num_frames: int, fps: float) -> str:
    """Reference filename scheme: <name>_<N>_frames_<fps>_fps.npz
    (parsed back by the dataset, amass_discrete_dataset.py:123-129)."""
    return f"{base}_{num_frames}_frames_{int(fps)}_fps.npz"


def parse_filename(path: str) -> Tuple[int, int]:
    """-> (num_frames, fps) from the reference filename scheme."""
    parts = os.path.basename(path)[:-4].split("_")
    return int(parts[-4]), int(parts[-2])


def process_file(model: smpl_lib.SmplModel, in_path: str, out_dir: str,
                 **kw) -> Optional[str]:
    """Process one raw AMASS npz -> output npz. Returns the output path
    or None if discarded."""
    raw = dict(np.load(in_path, allow_pickle=True))
    result = process_sequence(model, raw, **kw)
    if result is None:
        return None
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(out_dir, os.path.basename(in_path)[:-4])
    out_path = output_filename(base, result["trans"].shape[0],
                               result["fps"])
    np.savez(out_path, **result)
    return out_path
