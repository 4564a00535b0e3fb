"""Direct numerical parity against the reference implementation.

Imports the reference's torch rotation library READ-ONLY from
/root/reference (behavioral oracle only — our implementations are
independent jnp re-designs) and compares outputs on random inputs.
Skipped automatically when the reference tree is absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/humor"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch
    from utils import transforms as RT  # reference torch implementation

import jax.numpy as jnp

from humor_tpu.ops import transforms as T


def _rand_aa(n, scale=1.5, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 3) * scale).astype(np.float32)


def test_batch_rodrigues_parity():
    aa = _rand_aa(64)
    ours = np.asarray(T.aa_to_rotmat(jnp.asarray(aa)))
    ref = RT.batch_rodrigues(torch.from_numpy(aa)).numpy().reshape(-1, 3, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_rot6d_parity():
    rng = np.random.RandomState(1)
    x = rng.randn(64, 6).astype(np.float32)
    ours = np.asarray(T.rot6d_to_rotmat(jnp.asarray(x)))
    ref = RT.rot6d_to_rotmat(torch.from_numpy(x)).numpy().reshape(-1, 3, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rot9d_parity():
    rng = np.random.RandomState(2)
    x = (rng.randn(32, 9) * 0.8 + np.eye(3).reshape(1, 9)).astype(
        np.float32)
    ours = np.asarray(T.rot9d_to_rotmat(jnp.asarray(x)))
    ref = RT.rot9d_to_rotmat(torch.from_numpy(x)).numpy().reshape(-1, 3, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_rotmat_to_aa_parity():
    aa = _rand_aa(128, seed=3)
    R = np.asarray(T.aa_to_rotmat(jnp.asarray(aa)))
    ours = np.asarray(T.rotmat_to_aa(jnp.asarray(R)))
    ref = RT.rotation_matrix_to_angle_axis(
        torch.from_numpy(R.reshape(-1, 3, 3))).numpy()
    # both must invert aa_to_rotmat: compare against each other via the
    # rotation they represent (aa itself is unique up to 2pi wraps)
    R_ours = np.asarray(T.aa_to_rotmat(jnp.asarray(ours)))
    R_ref = np.asarray(T.aa_to_rotmat(jnp.asarray(ref.astype(np.float32))))
    np.testing.assert_allclose(R_ours, R_ref, atol=1e-4)
    np.testing.assert_allclose(R_ours, R, atol=1e-4)


def test_world2aligned_parity():
    """Our heading canonicalization is the CLOSED FORM Rz of the
    reference's arccos -> cross-axis -> Rodrigues round trip. The
    reference's axis normalization (axis/(|axis|+1e-6)) shrinks the
    rotation angle by a factor |by|/(|by|+1e-6), an O(1e-6/|by|) bias
    for headings nearly parallel to x (|by| small). We assert exact
    parity where that bias is below tolerance and the documented
    closed-form bound elsewhere (deliberate deviation — see
    compute_aligned_from_right's docstring)."""
    aa = _rand_aa(64, scale=1.0, seed=4)
    R = np.asarray(T.aa_to_rotmat(jnp.asarray(aa)))
    ours = np.asarray(T.compute_world2aligned_mat(jnp.asarray(R)))
    ref = RT.compute_world2aligned_mat(
        torch.from_numpy(R.reshape(-1, 3, 3))).numpy()
    body_right = -R[:, :, 0]
    by = np.abs(body_right[:, 1])
    well_cond = by > 0.05   # reference angle bias < ~2e-5 rad here
    np.testing.assert_allclose(ours[well_cond], ref[well_cond], atol=5e-5)
    # near the reference's degenerate band: bounded by its own eps bias
    # two eps sources: axis-normalization (angle x by/(by+1e-6)) and the
    # cos division (d arccos amplifies by 1/|sin|) — both O(1e-6/by)
    ang_bias = 2.0 * (np.pi + 1.0) * 1e-6 / np.maximum(by, 1e-7)
    np.testing.assert_array_less(
        np.abs(ours - ref).reshape(len(by), -1).max(-1),
        np.maximum(ang_bias, 5e-5) + 1e-3 * (by < 1e-4))
    # and ours is always an exact Rz: orthonormal, z-row/col = e_z
    eye = np.einsum("bij,bkj->bik", ours, ours)
    # c,s share the reference's (h + 1e-6) denominator, so c^2+s^2 =
    # 1 - O(2e-6/h): near-orthonormal, not exactly
    np.testing.assert_allclose(
        eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    np.testing.assert_allclose(
        ours[:, 2, :], np.broadcast_to([0.0, 0.0, 1.0], (len(ours), 3)),
        atol=1e-6)


def test_world2aligned_joints_parity():
    """Same eps-bias scoping as test_world2aligned_parity (the closed
    form deviates from the reference only inside its O(1e-6/|by|)
    regularization band)."""
    rng = np.random.RandomState(5)
    joints = rng.randn(16, 22, 3).astype(np.float32)
    ours = np.asarray(T.compute_world2aligned_joints_mat(
        jnp.asarray(joints)))
    ref = RT.compute_world2aligned_joints_mat(
        torch.from_numpy(joints)).numpy()
    right = joints[:, 2] - joints[:, 1]
    right = right / np.linalg.norm(right, axis=-1, keepdims=True)
    by = np.abs(right[:, 1])
    well_cond = by > 0.05
    np.testing.assert_allclose(ours[well_cond], ref[well_cond], atol=5e-5)
    ang_bias = 2.0 * (np.pi + 1.0) * 1e-6 / np.maximum(by, 1e-7)
    np.testing.assert_array_less(
        np.abs(ours - ref).reshape(len(by), -1).max(-1),
        np.maximum(ang_bias, 5e-5) + 1e-3 * (by < 1e-4))


def test_kl_and_lognormal_parity():
    """ELBO building blocks vs the reference formulas."""
    sys.path.insert(0, REF)
    rng = np.random.RandomState(6)
    qm = rng.randn(8, 48).astype(np.float32)
    qv = np.abs(rng.randn(8, 48).astype(np.float32)) + 0.1
    pm = rng.randn(8, 48).astype(np.float32)
    pv = np.abs(rng.randn(8, 48).astype(np.float32)) + 0.1

    from humor_tpu.losses.elbo import kl_normal, log_normal

    ours_kl = np.asarray(kl_normal(jnp.asarray(qm), jnp.asarray(qv),
                                   jnp.asarray(pm), jnp.asarray(pv)))
    tq, tv, tp, tpv = map(torch.from_numpy, (qm, qv, pm, pv))
    ref_kl = (0.5 * (torch.log(tpv) - torch.log(tv) + tv / tpv
                     + (tq - tp).pow(2) / tpv - 1)).sum(-1).numpy()
    np.testing.assert_allclose(ours_kl, ref_kl, rtol=1e-4)

    x = rng.randn(8, 48).astype(np.float32)
    ours_ln = np.asarray(log_normal(jnp.asarray(x), jnp.asarray(pm),
                                    jnp.asarray(pv)))
    import math
    ref_ln = (-torch.log(torch.sqrt(tpv)) - math.log(math.sqrt(2 * math.pi))
              - ((torch.from_numpy(x) - tp) ** 2 / (2 * tpv))).sum(-1).numpy()
    np.testing.assert_allclose(ours_ln, ref_ln, rtol=1e-4)
