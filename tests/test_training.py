"""Training-stack tests: windowing, loss, train steps (both phases),
data-parallel sharding on the 8-device CPU mesh, checkpoint roundtrip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.data.windows import window_to_pairs, window_to_global
from humor_tpu.losses.elbo import LossConfig, elbo_loss, kl_anneal_weight, kl_normal
from humor_tpu.models import humor as H
from humor_tpu.parallel.mesh import make_mesh, shard_batch
from humor_tpu.train import step as TS

CFG = H.HumorConfig()
MODEL = synthetic_smpl_model()
SMPL_MODELS = {"male": synthetic_smpl_model(jax.random.PRNGKey(10)),
               "female": synthetic_smpl_model(jax.random.PRNGKey(20))}


def make_batch(seed=0, B=4, T=5):
    world, meta = synthetic_world_batch(seed, B, T + 1, model=MODEL)
    data_in, data_out, global_out = window_to_pairs(world)
    return {
        "data_in": data_in,
        "data_out": data_out,
        "betas": meta["betas"],
        "gender_ids": meta["gender_ids"],
    }


class TestWindows:
    def test_pair_shapes(self):
        world, _ = synthetic_world_batch(0, 2, 7, model=MODEL)
        din, dout, gout = window_to_pairs(world)
        assert din["trans"].shape == (2, 6, 3)
        assert dout["joints"].shape == (2, 6, 66)
        assert gout["root_orient"].shape == (2, 6, 9)

    def test_inputs_are_canonical(self):
        world, _ = synthetic_world_batch(1, 3, 6, model=MODEL)
        din, _, _ = window_to_pairs(world)
        # every input step: trans xy == 0, heading aligned
        np.testing.assert_allclose(np.asarray(din["trans"][..., :2]), 0.0,
                                   atol=1e-4)
        R = np.asarray(din["root_orient"]).reshape(3, 5, 3, 3)
        right = -R[..., :, 0]
        horiz = right[..., :2] / np.linalg.norm(right[..., :2], axis=-1,
                                                keepdims=True)
        np.testing.assert_allclose(horiz[..., 0], 1.0, atol=1e-3)

    def test_translation_invariance(self):
        """Shifting the world must not change the pairs (reference +5m
        probe at dataset level)."""
        world, _ = synthetic_world_batch(2, 2, 5, model=MODEL)
        shift = jnp.asarray([7.0, -2.0, 0.0])
        world2 = dict(world)
        world2["trans"] = world["trans"] + shift
        world2["joints"] = (world["joints"].reshape(2, 5, 22, 3)
                            + shift).reshape(2, 5, 66)
        d1 = window_to_pairs(world)
        d2 = window_to_pairs(world2)
        for a, b in zip(d1, d2):
            for k in a:
                np.testing.assert_allclose(np.asarray(a[k]),
                                           np.asarray(b[k]), atol=2e-3,
                                           err_msg=k)

    def test_global_view_frame0(self):
        world, _ = synthetic_world_batch(3, 2, 5, model=MODEL)
        g = window_to_global(world)
        np.testing.assert_allclose(np.asarray(g["trans"][:, 0, :2]), 0.0,
                                   atol=1e-4)


class TestLoss:
    def test_kl_normal_zero_for_same(self):
        m = jnp.ones((4, 8))
        v = jnp.full((4, 8), 0.5)
        np.testing.assert_allclose(np.asarray(kl_normal(m, v, m, v)), 0.0,
                                   atol=1e-6)

    def test_anneal_schedule(self):
        cfg = LossConfig(kl_loss_anneal_start=0, kl_loss_anneal_end=50)
        assert float(kl_anneal_weight(cfg, 0)) == 0.0
        assert abs(float(kl_anneal_weight(cfg, 25)) - 0.5) < 1e-6
        assert float(kl_anneal_weight(cfg, 80)) == 1.0

    def test_full_loss_finite(self):
        key = jax.random.PRNGKey(0)
        batch = make_batch()
        params = H.init_params(CFG, key)
        fn = TS.supervised_loss_fn(CFG, LossConfig(), SMPL_MODELS)
        loss, stats = jax.jit(fn)(params, batch, key, 10)
        assert np.isfinite(float(loss))
        assert "kl_loss" in stats and "smpl_joint_loss" in stats
        assert np.isfinite(float(stats["contacts_acc"]))


class TestTrainStep:
    @pytest.fixture(scope="class")
    def steps(self):
        opt = TS.make_optimizer(lr=1e-4, steps_per_epoch=10)
        state = TS.init_train_state(CFG, opt, jax.random.PRNGKey(0))
        sup, ss, ev = TS.make_train_steps(CFG, LossConfig(), opt, SMPL_MODELS)
        return state, sup, ss, ev

    def test_supervised_step_reduces_loss(self, steps):
        state, sup, _, _ = steps
        batch = make_batch()
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, stats = sup(state, batch, jax.random.fold_in(key, i), 0)
            losses.append(float(stats["total_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_sched_samp_step_runs(self, steps):
        state, _, ss, _ = steps
        batch = make_batch()
        state, stats = ss(state, batch, jax.random.PRNGKey(2), 15, 0.5)
        assert np.isfinite(float(stats["total_loss"]))

    def test_eval_step(self, steps):
        state, _, _, ev = steps
        batch = make_batch(seed=5)
        stats = ev(state.params, batch, jax.random.PRNGKey(3), 0)
        assert np.isfinite(float(stats["total_loss"]))

    def test_curriculum_probs(self):
        assert TS.sched_samp_prob(5, 10, 20) == 1.0
        assert TS.sched_samp_prob(15, 10, 20) == 0.5
        assert TS.sched_samp_prob(25, 10, 20) == 0.0


class TestDataParallel:
    def test_sharded_supervised_step(self):
        """DP over the 8-device CPU mesh: same math, batch sharded."""
        mesh = make_mesh()
        assert mesh.devices.size == 8
        opt = TS.make_optimizer()
        state = TS.init_train_state(CFG, opt, jax.random.PRNGKey(0))
        sup, _, _ = TS.make_train_steps(CFG, LossConfig(), opt, SMPL_MODELS,
                                        mesh=mesh)
        batch = make_batch(B=8)
        batch_sh = shard_batch(mesh, batch)
        state2, stats = sup(state, batch_sh, jax.random.PRNGKey(1), 0)
        assert np.isfinite(float(stats["total_loss"]))

        # parity with unsharded execution
        sup0, _, _ = TS.make_train_steps(CFG, LossConfig(), opt, SMPL_MODELS)
        state3, stats0 = sup0(state, batch, jax.random.PRNGKey(1), 0)
        np.testing.assert_allclose(float(stats["total_loss"]),
                                   float(stats0["total_loss"]), rtol=1e-4)


class TestCheckpoint:
    def test_roundtrip(self):
        from humor_tpu.utils.checkpoint import load_state, save_state
        opt = TS.make_optimizer()
        state = TS.init_train_state(CFG, opt, jax.random.PRNGKey(0))
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "ckpt.npz")
            save_state(p, state.params, state.opt_state, epoch=7,
                       min_val_loss=1.25)
            restored = load_state(p, state.params, state.opt_state)
        assert restored["epoch"] == 7
        assert restored["min_val_loss"] == 1.25
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
