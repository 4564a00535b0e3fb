"""Camera / floor-plane geometry for test-time optimization.

Behavioral parity targets (new jnp implementations):
  /root/reference/humor/fitting/fitting_utils.py:61-83   (plane intersection)
  /root/reference/humor/fitting/fitting_utils.py:88-104  (floor 3d<->4d param)
  /root/reference/humor/fitting/fitting_utils.py:149-190 (compute_cam2prior)
  /root/reference/humor/fitting/fitting_utils.py:576-645 (apply_cam2prior)
  /root/reference/humor/fitting/fitting_utils.py:647-677 (perspective proj)

Conventions: camera frame has -y up (OpenCV-style); the prior (canonical)
frame has +z up. The floor plane is optimized as a 3-vector n*d (normal
scaled by offset) and parsed to (a, b, c, d) with the normal flipped to
face up in the camera frame.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from humor_tpu.ops import transforms

_HI = jax.lax.Precision.HIGHEST


def bdot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False
         ) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def compute_plane_intersection(point: jnp.ndarray, direction: jnp.ndarray,
                               plane: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray/plane intersection. point, direction (..., 3); plane (..., 4)
    as (a, b, c, d) with unit normal (a, b, c) and offset d. Returns
    (intersection (..., 3), s) with point + s*direction = intersection;
    s < 0 means the ray intersects in the -direction."""
    normal, off = plane[..., :3], plane[..., 3]
    denom = bdot(normal, direction)
    s = (off - bdot(normal, point)) / jnp.where(
        jnp.abs(denom) < 1e-12, jnp.sign(denom) * 1e-12 + 1e-12, denom)
    return point + s[..., None] * direction, s


def parse_floor_plane(floor_plane: jnp.ndarray) -> jnp.ndarray:
    """Optimization form (..., 3) = normal*offset -> (..., 4) = (unit
    normal, offset) with the normal's camera-frame y component forced
    non-positive (up, since camera -y is up)."""
    off = jnp.linalg.norm(floor_plane, axis=-1, keepdims=True)
    off = jnp.maximum(off, 1e-12)
    normal = floor_plane / off
    neg = normal[..., 1:2] > 0.0
    normal = jnp.where(neg, -normal, normal)
    off = jnp.where(neg, -off, off)
    return jnp.concatenate([normal, off], axis=-1)


def make_floor_plane_3d(normal: jnp.ndarray, offset: jnp.ndarray
                        ) -> jnp.ndarray:
    """Inverse of parse_floor_plane: 4d (unit normal, offset) -> 3d n*d."""
    return normal * offset[..., None]


def compute_cam2prior(floor_plane: jnp.ndarray, trans: jnp.ndarray,
                      root_orient_aa: jnp.ndarray, joints: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rigid transform from the camera frame to the canonical prior frame
    (z-up, heading-aligned at the key frame).

    floor_plane (B, 3) opt-form; trans (B, 3); root_orient_aa (B, 3);
    joints (B, J, 3). Returns (R (B, 3, 3), t (B, 3), root_height (B, 1)).
    """
    plane4 = parse_floor_plane(floor_plane)
    normal = plane4[..., :3]
    floor_trans, _ = compute_plane_intersection(trans, -normal, plane4)

    # prior-frame axes expressed in camera coordinates
    up_axis = normal
    R_root = transforms.aa_to_rotmat(root_orient_aa)
    body_right = -R_root[..., :, 0]
    floor_body_right, s = compute_plane_intersection(trans, body_right,
                                                     plane4)
    right_axis = floor_body_right - floor_trans
    right_axis = jnp.where(s[..., None] < 0, -right_axis, right_axis)
    right_axis = right_axis / jnp.maximum(
        jnp.linalg.norm(right_axis, axis=-1, keepdims=True), 1e-12)
    fwd_axis = jnp.cross(up_axis, right_axis)
    fwd_axis = fwd_axis / jnp.maximum(
        jnp.linalg.norm(fwd_axis, axis=-1, keepdims=True), 1e-12)

    prior_R = jnp.stack([right_axis, fwd_axis, up_axis], axis=-1)
    cam2prior_R = jnp.swapaxes(prior_R, -1, -2)
    cam2prior_t = -trans

    _, s_root = compute_plane_intersection(joints[..., 0, :], -normal,
                                           plane4)
    return cam2prior_R, cam2prior_t, s_root[..., None]


def apply_cam2prior(
    trans: jnp.ndarray,            # (B, T, 3)
    root_orient_aa: jnp.ndarray,   # (B, T, 3)
    R: jnp.ndarray,                # (B, 3, 3)
    t: jnp.ndarray,                # (B, 3)
    root_height: jnp.ndarray,      # (B, 1)
    key_frame_idx: jnp.ndarray,    # (B,) int
    smpl_root_joint_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray],
                                          jnp.ndarray]] = None,
    inverse: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Transform (trans, root_orient) between camera and prior frames.

    Forward: rotate orientations by R; move key-frame translation to the
    origin, rotate, then offset z so the key-frame SMPL root joint sits at
    `root_height` (the SMPL pass is supplied by `smpl_root_joint_fn(trans,
    root_orient_aa) -> root z (B, T)` so this module stays body-model
    agnostic). Inverse applies the exact reverse composition.
    """
    B, T = trans.shape[:2]
    R_mat = transforms.aa_to_rotmat(root_orient_aa)          # (B, T, 3, 3)
    Rt = R[:, None]                                          # (B, 1, 3, 3)
    if inverse:
        out_orient_mat = jnp.einsum("bji,btjk->btik", R, R_mat,
                                    precision=_HI)
    else:
        out_orient_mat = jnp.einsum("bij,btjk->btik", R, R_mat,
                                    precision=_HI)
    out_orient = transforms.rotmat_to_aa(out_orient_mat)

    if inverse:
        key_trans = jnp.take_along_axis(
            trans, key_frame_idx[:, None, None].astype(jnp.int32).repeat(3, -1),
            axis=1) if T > 1 else trans[:, 0:1]
        shifted = trans - key_trans
        rot = jnp.einsum("bji,btj->bti", R, shifted, precision=_HI)
        out_trans = rot - t[:, None]
    else:
        shifted = trans + t[:, None]
        rot = jnp.einsum("bij,btj->bti", R, shifted, precision=_HI)
        if smpl_root_joint_fn is not None:
            root_z = smpl_root_joint_fn(rot, out_orient)     # (B, T)
            if T > 1:
                cur_h = jnp.take_along_axis(
                    root_z, key_frame_idx[:, None].astype(jnp.int32),
                    axis=1)
            else:
                cur_h = root_z[:, 0:1]
            height_diff = root_height - cur_h                # (B, 1)
            offset = jnp.concatenate(
                [jnp.zeros((B, 2), trans.dtype), height_diff], axis=-1)
            rot = rot + offset[:, None]
        out_trans = rot

    return {"trans": out_trans, "root_orient": out_orient}


def rigid_transform_smpl_params(
    trans: jnp.ndarray,            # (B, T, 3)
    root_orient_aa: jnp.ndarray,   # (B, T, 3)
    rest_root_joint: jnp.ndarray,  # (B, 3) shaped rest-pose root joint
    R: jnp.ndarray,                # (3, 3) or (B, 3, 3)
    t: jnp.ndarray,                # (3,) or (B, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SMPL parameters that move the posed body rigidly: verts' = R v + t.

    SMPL composes the global orientation about the SHAPED rest root joint
    j0 (a function of betas only) and applies `trans` afterwards, so the
    transformed parameters are root' = R R_root and
    trans' = R (trans + j0) + t - j0. Used to express a world-frame GT
    sequence in a camera frame (e.g. the RGB fitting fixtures) without
    touching the body model.
    """
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    if R.ndim == 2:
        R = R[None]
    if t.ndim == 1:
        t = t[None]
    R_root = transforms.aa_to_rotmat(root_orient_aa)     # (B, T, 3, 3)
    new_root = transforms.rotmat_to_aa(
        jnp.einsum("bij,btjk->btik", R, R_root, precision=_HI))
    j0 = rest_root_joint[:, None]                        # (B, 1, 3)
    new_trans = jnp.einsum("bij,btj->bti", R, trans + j0,
                           precision=_HI) + t[:, None] - j0
    return new_trans, new_root


def perspective_projection(points: jnp.ndarray,       # (B, N, 3)
                           rotation: jnp.ndarray,     # (B, 3, 3)
                           translation: jnp.ndarray,  # (B, 3)
                           focal_length: jnp.ndarray, # (B, 2)
                           camera_center: jnp.ndarray # (B, 2)
                           ) -> jnp.ndarray:
    """Pinhole projection -> pixel coordinates (B, N, 2)."""
    pts = jnp.einsum("bij,bnj->bni", rotation, points, precision=_HI)
    pts = pts + translation[:, None]
    z = pts[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv = pts[..., :2] / z
    return uv * focal_length[:, None] + camera_center[:, None]
