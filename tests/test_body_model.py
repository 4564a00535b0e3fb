"""Tests for the native JAX SMPL body model (LBS)."""

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.gendered import gendered_forward
from humor_tpu.body_model.smpl import (
    SmplOutput, forward, lbs, synthetic_smpl_model,
)
from humor_tpu.ops import transforms as T

MODEL = synthetic_smpl_model()


class TestLbs:
    def test_rest_pose_is_template(self):
        B = 2
        out = forward(MODEL,
                      root_orient=jnp.zeros((B, 3)),
                      pose_body=jnp.zeros((B, 63)),
                      betas=jnp.zeros((B, 16)),
                      trans=jnp.zeros((B, 3)))
        np.testing.assert_allclose(
            np.asarray(out.v),
            np.broadcast_to(np.asarray(MODEL.v_template), (B, 256, 3)),
            atol=1e-5)

    def test_trans_is_additive(self):
        B = 2
        key = jax.random.PRNGKey(0)
        pose = 0.3 * jax.random.normal(key, (B, 63))
        betas = jax.random.normal(key, (B, 16)) * 0.5
        t = jnp.asarray([[1.0, 2.0, 3.0], [-1.0, 0.0, 0.5]])
        out0 = forward(MODEL, jnp.zeros((B, 3)), pose, betas, jnp.zeros((B, 3)))
        out1 = forward(MODEL, jnp.zeros((B, 3)), pose, betas, t)
        np.testing.assert_allclose(np.asarray(out1.v),
                                   np.asarray(out0.v + t[:, None]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out1.Jtr),
                                   np.asarray(out0.Jtr + t[:, None]), atol=1e-5)

    def test_global_rotation_rotates_everything(self):
        """Root rotation about the root joint: distances from root joint
        invariant; vertices rotate rigidly when pose/betas are zero."""
        B = 1
        aa = jnp.asarray([[0.0, 0.0, 1.3]])
        out0 = forward(MODEL, jnp.zeros((B, 3)), jnp.zeros((B, 63)),
                       jnp.zeros((B, 16)), jnp.zeros((B, 3)))
        out1 = forward(MODEL, aa, jnp.zeros((B, 63)),
                       jnp.zeros((B, 16)), jnp.zeros((B, 3)))
        R = np.asarray(T.aa_to_rotmat(aa))[0]
        root = np.asarray(out0.Jtr)[0, 0]
        expect = (np.asarray(out0.v)[0] - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(out1.v)[0], expect, atol=1e-4)

    def test_pose_moves_children_not_root(self):
        """Bending a knee moves the foot chain, not the upper body."""
        B = 1
        pose = np.zeros((B, 63), np.float32)
        knee = C.SMPL_JOINTS["leftLeg"]  # joint 4; pose index (4-1)*3
        pose[0, (knee - 1) * 3] = 1.0
        out0 = forward(MODEL, jnp.zeros((B, 3)), jnp.zeros((B, 63)),
                       jnp.zeros((B, 16)), jnp.zeros((B, 3)))
        out1 = forward(MODEL, jnp.zeros((B, 3)), jnp.asarray(pose),
                       jnp.zeros((B, 16)), jnp.zeros((B, 3)))
        j0, j1 = np.asarray(out0.Jtr)[0], np.asarray(out1.Jtr)[0]
        foot = C.SMPL_JOINTS["leftFoot"]
        assert np.linalg.norm(j1[foot] - j0[foot]) > 1e-3
        # root and right side unchanged
        np.testing.assert_allclose(j1[0], j0[0], atol=1e-5)
        np.testing.assert_allclose(j1[C.SMPL_JOINTS["rightFoot"]],
                                   j0[C.SMPL_JOINTS["rightFoot"]], atol=1e-5)

    def test_betas_change_shape(self):
        B = 2
        betas = jnp.concatenate([jnp.ones((1, 16)), -jnp.ones((1, 16))])
        out = forward(MODEL, jnp.zeros((B, 3)), jnp.zeros((B, 63)),
                      betas, jnp.zeros((B, 3)))
        assert np.abs(np.asarray(out.v[0] - out.v[1])).max() > 1e-3

    def test_differentiable(self):
        def loss(pose):
            out = forward(MODEL, jnp.zeros((1, 3)), pose,
                          jnp.zeros((1, 16)), jnp.zeros((1, 3)))
            return jnp.sum(out.Jtr ** 2)
        g = jax.grad(loss)(0.1 * jnp.ones((1, 63)))
        assert not np.any(np.isnan(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0

    def test_jit_and_vmap(self):
        fn = jax.jit(lambda p: forward(MODEL, jnp.zeros((4, 3)), p,
                                       jnp.zeros((4, 16)),
                                       jnp.zeros((4, 3))).Jtr)
        out = fn(0.1 * jnp.ones((4, 63)))
        assert out.shape == (4, 22, 3)


class TestGendered:
    def test_select_matches_single(self):
        key = jax.random.PRNGKey(1)
        m = synthetic_smpl_model(jax.random.PRNGKey(10))
        f = synthetic_smpl_model(jax.random.PRNGKey(20))
        models = {"male": m, "female": f}
        B = 4
        pose = 0.2 * jax.random.normal(key, (B, 63))
        betas = 0.3 * jax.random.normal(key, (B, 16))
        trans = jax.random.normal(key, (B, 3))
        gid = jnp.asarray([0, 1, 0, 1], jnp.int32)
        out = gendered_forward(models, gid, jnp.zeros((B, 3)), pose, betas,
                               trans)
        out_m = forward(m, jnp.zeros((B, 3)), pose, betas, trans)
        out_f = forward(f, jnp.zeros((B, 3)), pose, betas, trans)
        np.testing.assert_allclose(np.asarray(out.v[0]),
                                   np.asarray(out_m.v[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v[1]),
                                   np.asarray(out_f.v[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.Jtr[3]),
                                   np.asarray(out_f.Jtr[3]), atol=1e-6)


class TestBf16LossPipeline:
    """smpl.lbs compute_dtype=bf16: per-vertex blend in bf16 for the
    training-loss bodies; the joint path stays exact f32."""

    def _inputs(self, B=8):
        key = jax.random.PRNGKey(7)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return (0.3 * jax.random.normal(k1, (B, 3)),
                0.3 * jax.random.normal(k2, (B, 63)),
                0.5 * jax.random.normal(k3, (B, 16)),
                jax.random.normal(k4, (B, 3)))

    def test_joints_exact_verts_bounded(self):
        ro, pose, betas, trans = self._inputs()
        f32 = forward(MODEL, ro, pose, betas, trans)
        b16 = forward(MODEL, ro, pose, betas, trans,
                      compute_dtype=jnp.bfloat16)
        # body joints come from the f32 kinematic chain: bit-identical
        nj = 22
        np.testing.assert_array_equal(np.asarray(b16.Jtr[:, :nj]),
                                      np.asarray(f32.Jtr[:, :nj]))
        # vertex error is bf16 rounding of ~O(1 m) geometry
        err = np.abs(np.asarray(b16.v) - np.asarray(f32.v)).max()
        assert err < 2e-2, err
        assert np.asarray(b16.v).dtype == np.float32

    def test_mesh_loss_grads_finite_and_close(self):
        ro, pose, betas, trans = self._inputs(4)
        target = forward(MODEL, ro, pose, betas, trans).v

        def loss(p, cd):
            out = forward(MODEL, ro, p, betas, trans, compute_dtype=cd)
            return jnp.mean((out.v - target) ** 2)

        at = pose + 0.05   # away from the minimum so g32 != 0
        g32 = np.asarray(jax.grad(lambda p: loss(p, None))(at))
        g16 = np.asarray(jax.grad(
            lambda p: loss(p, jnp.bfloat16))(at))
        assert np.isfinite(g16).all()
        denom = np.abs(g32).max()
        assert np.abs(g16 - g32).max() < 0.05 * denom + 1e-6

    def test_gendered_threads_dtype(self):
        ro, pose, betas, trans = self._inputs(4)
        models = {"male": MODEL, "female": MODEL}
        gid = jnp.asarray([0, 1, 0, 1], jnp.int32)
        out32 = gendered_forward(models, gid, ro, pose, betas, trans)
        out16 = gendered_forward(models, gid, ro, pose, betas, trans,
                                 compute_dtype=jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(out16.Jtr[:, :22]),
                                      np.asarray(out32.Jtr[:, :22]))
        assert np.abs(np.asarray(out16.v)
                      - np.asarray(out32.v)).max() < 2e-2
