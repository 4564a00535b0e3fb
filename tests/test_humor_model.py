"""Tests for the HuMoR CVAE: shapes, rollout, inference, scheduled sampling,
and the encode->decode canonicalization probe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.models import humor as H
from humor_tpu.models import state as S
from humor_tpu.ops import transforms as T

CFG = H.HumorConfig()


@pytest.fixture(scope="module")
def params():
    return H.init_params(CFG, jax.random.PRNGKey(0))


def make_state(key, B=3, canonical=False):
    ks = jax.random.split(key, 8)
    if canonical:
        root = T.aa_to_rotmat(
            jnp.concatenate([jnp.zeros((B, 2)),
                             jax.random.normal(ks[2], (B, 1)) * 0.0], axis=-1))
        trans = jnp.concatenate(
            [jnp.zeros((B, 2)), jax.random.uniform(ks[0], (B, 1), minval=0.8,
                                                   maxval=1.0)], axis=-1)
    else:
        root = T.aa_to_rotmat(jax.random.normal(ks[2], (B, 3)))
        trans = jax.random.normal(ks[0], (B, 3))
    st = {
        "trans": trans,
        "trans_vel": 0.1 * jax.random.normal(ks[1], (B, 3)),
        "root_orient": root.reshape(B, 9),
        "root_orient_vel": 0.1 * jax.random.normal(ks[3], (B, 3)),
        "pose_body": T.aa_to_rotmat(
            0.3 * jax.random.normal(ks[4], (B, 21, 3))).reshape(B, 189),
        "joints": 0.5 * jax.random.normal(ks[5], (B, 66)),
        "joints_vel": 0.1 * jax.random.normal(ks[6], (B, 66)),
    }
    return st


class TestShapes:
    def test_param_count(self, params):
        """~9M params like the reference (SURVEY.md §6: three 1024-wide
        stacks; exact count depends on dims)."""
        n = H.param_count(params)
        assert 8_000_000 < n < 11_000_000

    def test_single_step(self, params):
        key = jax.random.PRNGKey(1)
        B = 5
        k1, k2 = jax.random.split(key)
        past = H.state_to_input(CFG, make_state(k1, B))
        t = H.state_to_input(CFG, make_state(k2, B))
        out = H.single_step(CFG, params, key, past, t)
        assert out.pred["trans"].shape == (B, 3)
        assert out.pred["root_orient"].shape == (B, 9)
        assert out.pred["pose_body"].shape == (B, 189)
        assert out.pred["contacts"].shape == (B, 9)
        assert out.posterior[0].shape == (B, 48)
        assert out.prior[0].shape == (B, 48)
        assert np.all(np.asarray(out.posterior[1]) > 0)
        # predicted rotations are valid rotation matrices
        # valid rotations (1e-2 tol: untrained decoder emits large aa
        # residuals, f32 Rodrigues + composition costs a few ulp-scale digits)
        R = np.asarray(out.pred["root_orient"]).reshape(B, 3, 3)
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3), (B, 3, 3)),
                                   atol=1e-2)

    def test_decode_delta_composition(self, params):
        """output_delta: vector outputs are prev + residual; with z fixed the
        decode is deterministic."""
        key = jax.random.PRNGKey(2)
        st = make_state(key)
        past = H.state_to_input(CFG, st)
        z = jnp.zeros((3, 48))
        out1 = H.decode(CFG, params, z, past)
        out2 = H.decode(CFG, params, z, past)
        np.testing.assert_array_equal(np.asarray(out1["trans"]),
                                      np.asarray(out2["trans"]))


class TestRollout:
    def test_rollout_shapes_and_validity(self, params):
        key = jax.random.PRNGKey(3)
        st = make_state(key, canonical=True)
        res = H.rollout(CFG, params, key, st, num_steps=7)
        assert res.world["trans"].shape == (3, 7, 3)
        assert res.world["joints"].shape == (3, 7, 66)
        assert res.z.shape == (3, 7, 48)
        R = np.asarray(res.world["root_orient"]).reshape(3, 7, 3, 3)
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2),
            np.broadcast_to(np.eye(3), (3, 7, 3, 3)), atol=1e-3)
        assert not np.any(np.isnan(np.asarray(res.world["trans"])))

    def test_rollout_z_seq_deterministic(self, params):
        key = jax.random.PRNGKey(4)
        st = make_state(key, canonical=True)
        z = 0.1 * jax.random.normal(key, (3, 5, 48))
        r1 = H.rollout(CFG, params, jax.random.PRNGKey(5), st, 5, z_seq=z)
        r2 = H.rollout(CFG, params, jax.random.PRNGKey(6), st, 5, z_seq=z)
        np.testing.assert_allclose(np.asarray(r1.world["trans"]),
                                   np.asarray(r2.world["trans"]), atol=1e-6)

    def test_rollout_canonicalization_invariance(self, params):
        """Same latent sequence from a world-shifted initial state gives the
        same motion relative to the start (the reference's +5m probe)."""
        key = jax.random.PRNGKey(7)
        st = make_state(key, canonical=False)
        z = 0.1 * jax.random.normal(key, (3, 5, 48))
        r1 = H.rollout(CFG, params, key, st, 5, z_seq=z,
                       canonicalize_input=True, uncanonicalize_output=True)

        st2 = dict(st)
        shift = jnp.array([5.0, 0.0, 0.0])
        st2["trans"] = st["trans"] + shift
        st2["joints"] = (st["joints"].reshape(3, 22, 3) + shift).reshape(3, 66)
        r2 = H.rollout(CFG, params, key, st2, 5, z_seq=z,
                       canonicalize_input=True, uncanonicalize_output=True)

        d1 = np.asarray(r1.world["trans"])
        d2 = np.asarray(r2.world["trans"]) - np.asarray(shift)
        np.testing.assert_allclose(d1, d2, atol=5e-3)
        np.testing.assert_allclose(np.asarray(r1.world["pose_body"]),
                                   np.asarray(r2.world["pose_body"]),
                                   atol=5e-3)

    def test_rollout_jits(self, params):
        key = jax.random.PRNGKey(8)
        st = make_state(key, canonical=True)
        fn = jax.jit(lambda p, k, s: H.rollout(CFG, p, k, s, 4).world["trans"])
        out = fn(params, key, st)
        assert out.shape == (3, 4, 3)


class TestInference:
    def test_infer_global_seq(self, params):
        key = jax.random.PRNGKey(9)
        st = make_state(key, canonical=True)
        roll = H.rollout(CFG, params, key, st, 6)
        seq = {k: v for k, v in roll.world.items()
               if k in CFG.input_spec.names}
        res = H.infer_global_seq(CFG, params, seq)
        assert res.posterior[0].shape == (3, 5, 48)
        assert np.all(np.asarray(res.posterior[1]) > 0)

    def test_encode_decode_roundtrip_consistency(self, params):
        """Encoding a rolled-out sequence and re-decoding with posterior
        means must reproduce similar first-step translation (loose sanity
        check; tight parity requires a trained checkpoint)."""
        key = jax.random.PRNGKey(10)
        st = make_state(key, canonical=True)
        roll = H.rollout(CFG, params, key, st, 4, use_mean=True)
        seq = {k: jnp.concatenate([st[k][:, None], v], axis=1)
               for k, v in roll.world.items() if k in CFG.input_spec.names}
        res = H.infer_global_seq(CFG, params, seq)
        zs = res.posterior[0]
        re = H.rollout(CFG, params, key, st, 4, z_seq=zs)
        assert not np.any(np.isnan(np.asarray(re.world["trans"])))


class TestScheduledSampling:
    def test_sched_samp_shapes(self, params):
        key = jax.random.PRNGKey(11)
        B, T_ = 3, 6
        st = make_state(key, canonical=True)
        x_past = jax.random.normal(key, (B, T_, 339))
        x_t = jax.random.normal(key, (B, T_, 339))
        out = H.scheduled_sampling(CFG, params, key, x_past, x_t, st,
                                   use_gt_p=0.5)
        assert out.pred["trans"].shape == (B, T_, 3)
        assert out.posterior[0].shape == (B, T_, 48)

    def test_sched_samp_p1_equals_supervised(self, params):
        """With p=1 every step uses GT input, so step outputs must equal
        independent single_step calls with the same keys."""
        key = jax.random.PRNGKey(12)
        B, T_ = 2, 4
        st = make_state(key, B=B, canonical=True)
        x_past = jax.random.normal(key, (B, T_, 339))
        x_t = jax.random.normal(key, (B, T_, 339))
        out = H.scheduled_sampling(CFG, params, key, x_past, x_t, st,
                                   use_gt_p=1.0)
        # replicate the internal key derivation
        k2, _ = jax.random.split(key)
        step_keys = jax.random.split(k2, T_)
        for t in range(T_):
            ref = H.single_step(CFG, params, step_keys[t], x_past[:, t],
                                x_t[:, t])
            np.testing.assert_allclose(
                np.asarray(out.pred["trans"][:, t]),
                np.asarray(ref.pred["trans"]), atol=1e-5)


class TestComputeDtype:
    """compute_dtype="bfloat16" must change only matmul input precision
    (accumulation and everything between matmuls stays f32)."""

    def test_bf16_outputs_close_to_f32(self, params):
        cfg16 = H.HumorConfig(compute_dtype="bfloat16")
        st = make_state(jax.random.PRNGKey(4))
        past = CFG.input_spec.pack(st)
        m32, v32 = H.prior(CFG, params, past)
        m16, v16 = H.prior(cfg16, params, past)
        assert m16.dtype == jnp.float32
        # bf16 has ~3 decimal digits; activations are O(1)
        np.testing.assert_allclose(np.asarray(m16), np.asarray(m32),
                                   atol=0.15)
        assert float(jnp.max(jnp.abs(m16 - m32))) > 0.0  # actually lower
        z = jax.random.normal(jax.random.PRNGKey(5),
                              (3, CFG.latent_size))
        d32 = H.decode(CFG, params, z, past)
        d16 = H.decode(cfg16, params, z, past)
        for k in d32:
            np.testing.assert_allclose(
                np.asarray(d16[k]), np.asarray(d32[k]), atol=0.2,
                err_msg=k)

    def test_bf16_grads_finite(self, params):
        cfg16 = H.HumorConfig(compute_dtype="bfloat16")
        st = make_state(jax.random.PRNGKey(6))
        past = CFG.input_spec.pack(st)

        def loss(p):
            m, v = H.prior(cfg16, p, past)
            return jnp.sum(jnp.square(m)) + jnp.sum(v)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
        assert all(x.dtype == jnp.float32 for x in leaves)
