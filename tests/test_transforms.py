"""Property tests for the rotation library (SURVEY.md §4: rotation-math
property tests + parity checks against the reference formulas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.ops import transforms as T


def random_rotmats(key, n):
    aa = jax.random.normal(key, (n, 3)) * 1.5
    return T.aa_to_rotmat(aa)


def assert_valid_rotation(R, atol=1e-5):
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=atol)


class TestAngleAxis:
    def test_identity(self):
        R = T.aa_to_rotmat(jnp.zeros((4, 3)))
        np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
                                   atol=1e-6)

    def test_known_rotation(self):
        # pi/2 about z: x -> y
        R = T.aa_to_rotmat(jnp.array([[0.0, 0.0, jnp.pi / 2]]))
        v = R[0] @ jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(v, jnp.array([0.0, 1.0, 0.0]), atol=1e-6)

    def test_roundtrip(self):
        key = jax.random.PRNGKey(0)
        aa = jax.random.normal(key, (64, 3))
        aa = aa / jnp.linalg.norm(aa, axis=-1, keepdims=True) \
            * jax.random.uniform(key, (64, 1), minval=0.01, maxval=3.0)
        aa2 = T.rotmat_to_aa(T.aa_to_rotmat(aa))
        np.testing.assert_allclose(aa, aa2, atol=1e-4)

    def test_roundtrip_near_pi(self):
        axis = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        aa = axis * (jnp.pi - 1e-3)
        R = T.aa_to_rotmat(aa)
        R2 = T.aa_to_rotmat(T.rotmat_to_aa(R))
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_grad_no_nan_at_identity(self):
        def f(aa):
            return jnp.sum(T.rotmat_to_aa(T.aa_to_rotmat(aa)) ** 2)
        g = jax.grad(f)(jnp.zeros((2, 3)))
        assert not np.any(np.isnan(np.asarray(g)))

    def test_batch_dims(self):
        key = jax.random.PRNGKey(1)
        aa = jax.random.normal(key, (2, 5, 7, 3))
        R = T.aa_to_rotmat(aa)
        assert R.shape == (2, 5, 7, 3, 3)
        # aa with norm > pi aliases to the shortest arc; compare matrices
        R2 = T.aa_to_rotmat(T.rotmat_to_aa(R))
        np.testing.assert_allclose(R, R2, atol=1e-4)


class TestSixD:
    def test_valid_rotation(self):
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (32, 6))
        assert_valid_rotation(T.rot6d_to_rotmat(x))

    def test_identity_from_cols(self):
        x = jnp.array([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0]])  # cols e1, e2
        np.testing.assert_allclose(T.rot6d_to_rotmat(x)[0], jnp.eye(3),
                                   atol=1e-6)


class TestNineD:
    def test_projects_to_rotation(self):
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (16, 9))
        assert_valid_rotation(T.rot9d_to_rotmat(x), atol=1e-4)

    def test_fixes_rotations(self):
        R = random_rotmats(jax.random.PRNGKey(4), 8)
        R2 = T.rot9d_to_rotmat(R.reshape(8, 9))
        np.testing.assert_allclose(R, R2, atol=1e-4)


class TestQuat:
    def test_mat_quat_roundtrip(self):
        R = random_rotmats(jax.random.PRNGKey(5), 64)
        R2 = T.quat_to_rotmat(T.rotmat_to_quat(R))
        np.testing.assert_allclose(R, R2, atol=1e-4)


class TestHeadingAlignment:
    def test_aligns_heading(self):
        """After applying W, the body-right horizontal projection is +x."""
        key = jax.random.PRNGKey(6)
        R = random_rotmats(key, 32)
        W = T.compute_world2aligned_mat(R)
        aligned = W @ R
        body_right = -aligned[:, :, 0]
        horiz = body_right[:, :2]
        horiz = horiz / jnp.linalg.norm(horiz, axis=-1, keepdims=True)
        np.testing.assert_allclose(horiz[:, 0], 1.0, atol=1e-3)
        np.testing.assert_allclose(horiz[:, 1], 0.0, atol=1e-3)

    def test_rotation_about_z_only(self):
        key = jax.random.PRNGKey(7)
        R = random_rotmats(key, 16)
        W = T.compute_world2aligned_mat(R)
        # z axis is preserved by a rotation about z
        z = jnp.array([0.0, 0.0, 1.0])
        np.testing.assert_allclose(W @ z, jnp.broadcast_to(z, (16, 3)),
                                   atol=1e-4)

    def test_identity_when_aligned(self):
        # body_right = -R[:, :, 0] = +x, already canonical -> W = I
        Rz_pi = np.asarray([[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]],
                           np.float32)
        W = T.compute_world2aligned_mat(
            jnp.broadcast_to(jnp.asarray(Rz_pi), (3, 3, 3)))
        np.testing.assert_allclose(W, np.broadcast_to(np.eye(3), (3, 3, 3)),
                                   atol=1e-5)

    def test_backward_heading_canonicalizes(self):
        """body_right exactly along -x (by = 0): the closed form returns
        Rz(pi) — a real canonicalization. (Deliberate deviation from the
        reference, whose cross-product axis collapses to zero there and
        silently SKIPS canonicalizing inside a 1e-6-wide band — see
        compute_aligned_from_right docstring.)"""
        R = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))  # body_right = -x
        W = T.compute_world2aligned_mat(R)
        aligned_right = -(W @ R)[:, :, 0]
        np.testing.assert_allclose(aligned_right[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(W @ jnp.asarray([0.0, 0.0, 1.0]),
                                   np.tile([0.0, 0, 1], (2, 1)), atol=1e-6)


class TestConvert:
    @pytest.mark.parametrize("rep,size", [("aa", 3), ("6d", 6), ("9d", 9),
                                          ("mat", 9)])
    def test_packed_multi_joint(self, rep, size):
        key = jax.random.PRNGKey(8)
        x = jax.random.normal(key, (4, 21 * size))
        out = T.convert_to_rotmat(x, rep)
        assert out.shape == (4, 21 * 9)
        if rep == "mat":  # pass-through, no projection to SO(3)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        else:
            assert_valid_rotation(out.reshape(4, 21, 3, 3), atol=1e-4)


class TestTorchParity:
    """Cross-check against the exact reference formulas, re-expressed in
    numpy (not imported from the reference)."""

    def test_rodrigues_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(0)
        aa = rng.randn(32, 3).astype(np.float32)
        ours = np.asarray(T.aa_to_rotmat(jnp.asarray(aa)))
        theirs = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_mat_to_aa_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(1)
        Rm = Rotation.random(64, random_state=rng).as_matrix().astype(np.float32)
        ours = np.asarray(T.rotmat_to_aa(jnp.asarray(Rm)))
        theirs = Rotation.from_matrix(Rm).as_rotvec()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)
