"""Procedural motion generator: AMASS-like world-frame sequences from the
synthetic body model, for tests and benchmarks (licensed AMASS/SMPL assets
cannot ship — SURVEY.md §7).

Produces kinematically-consistent states: joints come from the actual
body-model forward, velocities are the same finite differences the AMASS
preprocessing uses (reference scripts/process_amass_data.py:309-339), and
contacts follow the velocity+height heuristic (:89-253, simplified).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.smpl import SmplModel, forward, synthetic_smpl_model
from humor_tpu.ops import transforms


def _smooth_noise(rng: np.random.RandomState, shape, scale, smooth=8):
    """Temporally smooth noise: moving-average of white noise over time
    (axis 1)."""
    x = rng.randn(*shape).astype(np.float32)
    smooth = min(smooth, shape[1])  # convolve('same') grows short inputs
    k = np.ones(smooth, np.float32) / smooth
    x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, x)
    return x * scale


def synthetic_world_batch(
    seed: int,
    batch: int,
    num_frames: int,
    model: Optional[SmplModel] = None,
    fps: float = 30.0,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Generate a batch of world-frame motion windows.

    Returns (world, meta):
      world: typed state dict, components (B, F, D), matrix rotations,
             F = num_frames
      meta: {"betas": (B, 16), "gender_ids": (B,)}
    """
    if model is None:
        model = synthetic_smpl_model()
    rng = np.random.RandomState(seed)
    B, F = batch, num_frames

    betas = rng.randn(B, 16).astype(np.float32) * 0.5
    gender_ids = rng.randint(0, 2, size=B).astype(np.int32)

    # smooth walking-like root trajectory
    heading = np.cumsum(_smooth_noise(rng, (B, F), 0.05), axis=1)
    speed = np.abs(_smooth_noise(rng, (B, F), 0.4)) + 0.2
    dx = np.cos(heading) * speed / fps
    dy = np.sin(heading) * speed / fps
    trans = np.stack([
        np.cumsum(dx, axis=1),
        np.cumsum(dy, axis=1),
        0.9 + _smooth_noise(rng, (B, F), 0.02),
    ], axis=-1).astype(np.float32)
    trans += rng.randn(B, 1, 3).astype(np.float32) * np.asarray([2, 2, 0.02])

    # root orientation: heading about z plus small tilt
    tilt = _smooth_noise(rng, (B, F, 2), 0.08)
    root_aa = np.stack([tilt[..., 0], tilt[..., 1], heading], axis=-1)

    # body pose: smooth around a base pose
    base = rng.randn(B, 1, 21, 3).astype(np.float32) * 0.2
    pose_aa = base + _smooth_noise(rng, (B, F, 21, 3), 0.15)

    # run the body model for joints (kinematic consistency)
    root_flat = jnp.asarray(root_aa.reshape(B * F, 3))
    pose_flat = jnp.asarray(pose_aa.reshape(B * F, 63))
    betas_flat = jnp.asarray(np.repeat(betas, F, axis=0))
    trans_flat = jnp.asarray(trans.reshape(B * F, 3))
    out = jax.jit(forward)(model, root_flat, pose_flat, betas_flat, trans_flat)
    joints = np.asarray(out.Jtr).reshape(B, F, -1, 3)[:, :, :C.NUM_SMPL_JOINTS]

    root_mat = np.asarray(transforms.aa_to_rotmat(jnp.asarray(root_aa)))
    pose_mat = np.asarray(transforms.aa_to_rotmat(jnp.asarray(pose_aa)))

    # finite-difference velocities (matching preprocessing: central-ish,
    # here forward differences with edge copy)
    def fdiff(x):
        v = np.empty_like(x)
        v[:, :-1] = (x[:, 1:] - x[:, :-1]) * fps
        v[:, -1] = v[:, -2]
        return v

    trans_vel = fdiff(trans)
    joints_vel = fdiff(joints)
    # angular velocity: unskew of (R_{t+1} R_t^T - I) * fps approximation
    dR = np.matmul(root_mat[:, 1:], np.swapaxes(root_mat[:, :-1], -1, -2))
    w = np.stack([dR[..., 2, 1] - dR[..., 1, 2],
                  dR[..., 0, 2] - dR[..., 2, 0],
                  dR[..., 1, 0] - dR[..., 0, 1]], axis=-1) * (0.5 * fps)
    root_orient_vel = np.concatenate([w, w[:, -1:]], axis=1).astype(np.float32)

    # contacts: low foot joints with small velocity
    contact_j = joints[:, :, np.asarray(C.CONTACT_INDS)]
    contact_v = joints_vel[:, :, np.asarray(C.CONTACT_INDS)]
    floor_z = joints[..., 2].min(axis=(1, 2), keepdims=True)[..., None]
    low = contact_j[..., 2] < (floor_z[..., 0] + 0.12)
    slow = np.linalg.norm(contact_v, axis=-1) < 0.5
    contacts = (low & slow).astype(np.float32)

    world = {
        "trans": jnp.asarray(trans),
        "trans_vel": jnp.asarray(trans_vel),
        "root_orient": jnp.asarray(root_mat.reshape(B, F, 9)),
        "root_orient_vel": jnp.asarray(root_orient_vel),
        "pose_body": jnp.asarray(pose_mat.reshape(B, F, 21 * 9)),
        "joints": jnp.asarray(joints.reshape(B, F, -1)),
        "joints_vel": jnp.asarray(joints_vel.reshape(B, F, -1)),
        "contacts": jnp.asarray(contacts),
    }
    meta = {"betas": jnp.asarray(betas),
            "gender_ids": jnp.asarray(gender_ids)}
    return world, meta
