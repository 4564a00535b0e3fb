"""Rotation / rigid-transform library for the HuMoR-TPU framework.

Pure-functional, jit/vmap/grad-safe jnp implementations of every rotation
representation the framework uses:

    angle-axis (aa, 3)  <->  rotation matrix (mat, 3x3 / 9)
    6d (Zhou et al. continuity rep)  ->  mat
    9d (Levinson et al. SVD projection)  ->  mat
    quaternion (wxyz)  <->  mat / aa

Functional parity targets (reference, for behavior only — new implementation):
  /root/reference/humor/utils/transforms.py:139-170  (batch_rodrigues)
  /root/reference/humor/utils/transforms.py:201-241  (rot6d/rot9d)
  /root/reference/humor/utils/transforms.py:243-389  (mat->quat->aa chain)
  /root/reference/humor/utils/transforms.py:17-58    (heading alignment)

Design differences from the reference (TPU-first):
  * every function accepts arbitrary leading batch dims (reference is B-flat),
  * branch selection is data-parallel `where`-select (no boolean indexing),
  * gradients are safe at the identity / pi singularities via the
    double-where trick (the reference patches NaNs after the fact, which
    still poisons reverse-mode gradients under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# 3x3 rotation algebra must stay f32 on TPU
_HI = jax.lax.Precision.HIGHEST


def _norm_safe(x: jnp.ndarray, axis: int = -1, keepdims: bool = True,
               eps: float = _EPS) -> jnp.ndarray:
    """L2 norm with a grad-safe guard at 0 (returns eps there)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def aa_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (..., 3) -> rotation matrices (..., 3, 3) (Rodrigues).

    Matches reference batch_rodrigues (transforms.py:139) including its
    +1e-8 bias inside the norm, so imported checkpoints reproduce bitwise-
    comparable activations.
    """
    batch_shape = aa.shape[:-1]
    aa = aa.reshape(-1, 3)
    angle = _norm_safe(aa + 1e-8, axis=1)  # (N, 1)
    axis = aa / angle
    c = jnp.cos(angle)[..., None]  # (N,1,1)
    s = jnp.sin(angle)[..., None]

    rx, ry, rz = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)
    eye = jnp.eye(3, dtype=aa.dtype)
    R = eye + s * K + (1.0 - c) * jnp.matmul(K, K, precision=_HI)
    return R.reshape(*batch_shape, 3, 3)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6d rep (..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al.).

    Column convention matches reference rot6d_to_rotmat (transforms.py:201):
    the 6 numbers are the first two *columns* of the matrix read row-major
    from a (3, 2) view.
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[..., 0], x[..., 1]
    # eps=1e-4: a degenerate (near-zero / near-parallel) 6d input yields a
    # non-rotation either way, but a tiny eps turns its pullback into
    # ~1/eps^2-scale gradients that destroy L-BFGS line searches
    b1 = a1 / _norm_safe(a1, eps=1e-4)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / _norm_safe(a2_proj, eps=1e-4)
    b3 = jnp.cross(b1, b2)
    R = jnp.stack([b1, b2, b3], axis=-1)
    return R.reshape(*batch_shape, 3, 3)


def rot9d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """9d rep (..., 9) -> closest rotation (..., 3, 3) by SVD projection
    (Levinson et al.; reference transforms.py:222)."""
    batch_shape = x.shape[:-1]
    m = x.reshape(-1, 3, 3)
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(u @ vt)
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (u * d[:, None, :]) @ vt
    return R.reshape(*batch_shape, 3, 3)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4) in (w, x, y, z).

    Branchless 4-case selection (same case logic as reference
    transforms.py:269-343, expressed as where-selects). Grad-safe: every
    sqrt argument is clamped before use.
    """
    batch_shape = R.shape[:-2]
    m = R.reshape(-1, 3, 3)
    # Work on the transpose like the reference does (it builds quats of R^T
    # element reads; net result identical because of its symmetric sums).
    rt = jnp.swapaxes(m, -1, -2)
    r00, r01, r02 = rt[:, 0, 0], rt[:, 0, 1], rt[:, 0, 2]
    r10, r11, r12 = rt[:, 1, 0], rt[:, 1, 1], rt[:, 1, 2]
    r20, r21, r22 = rt[:, 2, 0], rt[:, 2, 1], rt[:, 2, 2]

    t0 = 1.0 + r00 - r11 - r22
    q0 = jnp.stack([r12 - r21, t0, r01 + r10, r20 + r02], axis=-1)
    t1 = 1.0 - r00 + r11 - r22
    q1 = jnp.stack([r20 - r02, r01 + r10, t1, r12 + r21], axis=-1)
    t2 = 1.0 - r00 - r11 + r22
    q2 = jnp.stack([r01 - r10, r20 + r02, r12 + r21, t2], axis=-1)
    t3 = 1.0 + r00 + r11 + r22
    q3 = jnp.stack([t3, r12 - r21, r20 - r02, r01 - r10], axis=-1)

    eps = 1e-6
    mask_d2 = r22 < eps
    mask_d0_d1 = r00 > r11
    mask_d0_nd1 = r00 < -r11

    c0 = mask_d2 & mask_d0_d1
    c1 = mask_d2 & ~mask_d0_d1
    c2 = ~mask_d2 & mask_d0_nd1
    # c3 = remaining

    t_sel = jnp.where(c0, t0, jnp.where(c1, t1, jnp.where(c2, t2, t3)))
    q_sel = jnp.where(
        c0[:, None], q0,
        jnp.where(c1[:, None], q1, jnp.where(c2[:, None], q2, q3)),
    )
    denom = jnp.sqrt(jnp.maximum(t_sel, eps))
    q = 0.5 * q_sel / denom[:, None]
    return q.reshape(*batch_shape, 4)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) wxyz -> angle-axis (..., 3).

    Grad-safe: the sign flip picks the shortest arc (w >= 0), and near
    the identity the angle/sin ratio switches to its Taylor limit with a
    float32-sized threshold (sin^2 < 1e-4, i.e. theta < ~0.02 rad; the
    ratio error there is O(theta^2/6) ~ 7e-5 relative). A tiny threshold
    (the previous 1e-14) routes float32 near-identity rotations through
    angle/sin whose autodiff amplifies roundoff to ~1e9-scale gradients.
    """
    # q and -q are the same rotation: flip so w >= 0 (shortest arc)
    flip = jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    q = q * flip
    qw, qvec = q[..., 0], q[..., 1:]
    sin_sq = jnp.sum(qvec * qvec, axis=-1)
    is_small = sin_sq < 1e-4
    # double-where: keep each branch's intermediate away from its
    # singularity on the side we won't take
    sin_safe = jnp.sqrt(jnp.where(is_small, 1.0, sin_sq))
    angle = 2.0 * jnp.arctan2(sin_safe, qw)
    k_large = angle / sin_safe
    k_small = 2.0 / jnp.maximum(qw, 1e-6)
    k = jnp.where(is_small, k_small, k_large)
    return qvec * k[..., None]


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) wxyz -> rotation matrices (..., 3, 3)."""
    q = q / _norm_safe(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (wy + xz),
            2 * (wz + xy), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (wx + yz), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return R.reshape(*q.shape[:-1], 3, 3)


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> angle-axis (..., 3).

    Equivalent of reference rotation_matrix_to_angle_axis (transforms.py:243)
    without its explicit NaN patching — the conversion here is NaN-free by
    construction.
    """
    return quat_to_aa(rotmat_to_quat(R))


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two columns, row-major of the (3,2) view."""
    return R[..., :, :2].reshape(*R.shape[:-2], 6)


def convert_to_rotmat(x: jnp.ndarray, rep: str) -> jnp.ndarray:
    """Convert a packed rotation tensor (..., N*rep_size) -> (..., N*9).

    Equivalent of reference convert_to_rotmat (transforms.py:60), generalized
    to arbitrary leading dims.
    """
    sizes = {"aa": 3, "6d": 6, "9d": 9, "mat": 9}
    rs = sizes[rep]
    batch_shape = x.shape[:-1]
    n = x.shape[-1] // rs
    flat = x.reshape(-1, rs)
    if rep == "aa":
        R = aa_to_rotmat(flat)
    elif rep == "6d":
        R = rot6d_to_rotmat(flat)
    elif rep == "9d":
        R = rot9d_to_rotmat(flat)
    elif rep == "mat":
        R = flat.reshape(-1, 3, 3)
    else:
        raise ValueError(f"unknown rotation rep {rep!r}")
    return R.reshape(*batch_shape, n * 9)


# ---------------------------------------------------------------------------
# Heading canonicalization
# ---------------------------------------------------------------------------

def rotmat_multiply(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 rotation product A @ B (..., 3, 3) via broadcast
    multiply-add — exact f32 (no MXU bf16 truncation) and free of
    dot_general, which Mosaic limits to one batch dimension, so this is
    safe inside Pallas kernels tracing shared model code."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def rotmat_apply(W: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate point/vector sets: W (..., 3, 3) applied to pts (..., N, 3)
    -> (..., N, 3), same construction rationale as rotmat_multiply."""
    return jnp.sum(W[..., None, :, :] * pts[..., :, None, :], axis=-1)


def compute_aligned_from_right(body_right: jnp.ndarray) -> jnp.ndarray:
    """Rotation that takes the horizontal projection of `body_right` (..., 3)
    onto the world +x axis, rotating only about world z.

    Equivalent of reference compute_aligned_from_right (transforms.py:17)
    in closed form: the reference's arccos -> cross-product-axis ->
    Rodrigues round trip always produces Rz(psi) with cos(psi) = bx/h and
    sin(psi) = by/h (h = |body_right_xy|), so we build that rotation
    directly. This removes arccos' infinite derivative at aligned
    headings (the reference's clip only bounds the INPUT) and contains no
    inverse-trig/array-literal ops, so the function also traces inside
    the Pallas rollout kernel (Mosaic has neither acos nor atan2).
    Degenerate vertical headings (h ~ 0) return identity, matching the
    reference's eps-regularized limit.
    """
    bx, by = body_right[..., 0:1], body_right[..., 1:2]
    h = jnp.sqrt(jnp.maximum(bx * bx + by * by, 1e-12))
    degenerate = h < 1e-6
    c = jnp.where(degenerate, 1.0, bx / (h + 1e-6))
    s = jnp.where(degenerate, 0.0, by / (h + 1e-6))
    zero1 = jnp.zeros_like(c)
    one1 = jnp.ones_like(c)
    # rows of Rz(psi): [[c, s, 0], [-s, c, 0], [0, 0, 1]]
    row0 = jnp.stack([c, s, zero1], axis=-1)
    row1 = jnp.stack([-s, c, zero1], axis=-1)
    row2 = jnp.stack([zero1, zero1, one1], axis=-1)
    return jnp.concatenate([row0, row1, row2], axis=-2)


def compute_world2aligned_mat(R: jnp.ndarray) -> jnp.ndarray:
    """World root orientations (..., 3, 3) -> heading-canonicalizing rotations.

    The body-frame x axis points left, so body-right = -R[:, :, 0]
    (reference compute_world2aligned_mat, transforms.py:33).
    """
    return compute_aligned_from_right(-R[..., :, 0])


def compute_world2aligned_joints_mat(joints: jnp.ndarray,
                                     left_idx: int = 1,
                                     right_idx: int = 2) -> jnp.ndarray:
    """Heading canonicalization from hip joints (..., J, 3)
    (reference transforms.py:45; default indices are SMPL left/rightUpLeg)."""
    body_right = joints[..., right_idx, :] - joints[..., left_idx, :]
    body_right = body_right / _norm_safe(body_right)
    return compute_aligned_from_right(body_right)
