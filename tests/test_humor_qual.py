"""HuMoR-Qual: SMPL-joint feedback inside the rollout and
scheduled-sampling scans (reference use_smpl_joint_inputs,
humor_model.py:510-592, 894-940)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.gendered import make_rollout_joint_fn
from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.models import humor as H


@pytest.fixture(scope="module")
def setup():
    cfg = H.HumorConfig()
    params = H.init_params(cfg, jax.random.PRNGKey(0))
    body = synthetic_smpl_model()
    models = {"male": body,
              "female": synthetic_smpl_model(jax.random.PRNGKey(7))}
    world, meta = synthetic_world_batch(0, 3, 6, model=body)
    return cfg, params, body, models, world, meta


def test_rollout_with_smpl_joint_feedback(setup):
    cfg, params, body, models, world, meta = setup
    init_state = {k: v[:, 0] for k, v in world.items()
                  if k in cfg.input_spec.names}
    # all-male: the world's joints come from the male bank, so the rollout
    # trans2joint (root-joint offset) is consistent with the feedback SMPL
    # and world-frame equivariance is exact
    gender_ids = jnp.zeros_like(meta["gender_ids"])
    joint_fn = make_rollout_joint_fn(models, gender_ids, meta["betas"])

    roll_plain = H.rollout(cfg, params, jax.random.PRNGKey(1), init_state,
                           5, use_mean=True, canonicalize_input=True)
    roll_qual = H.rollout(cfg, params, jax.random.PRNGKey(1), init_state,
                          5, use_mean=True, canonicalize_input=True,
                          smpl_joint_fn=joint_fn)

    for v in jax.tree_util.tree_leaves(roll_qual.world):
        assert np.all(np.isfinite(np.asarray(v)))
    # reference semantics (:894): the OUTPUT keeps the regressed joints;
    # only the fed-back input is replaced. So step 0 is identical to the
    # plain rollout and trajectories diverge from step 1 onward.
    for k in roll_plain.world:
        np.testing.assert_allclose(
            np.asarray(roll_plain.world[k][:, 0]),
            np.asarray(roll_qual.world[k][:, 0]), atol=1e-6,
            err_msg=f"step-0 {k} must be feedback-independent")
    assert not np.allclose(np.asarray(roll_plain.world["trans"][:, 1:]),
                           np.asarray(roll_qual.world["trans"][:, 1:]))
    assert not np.allclose(np.asarray(roll_plain.world["joints"][:, 1:]),
                           np.asarray(roll_qual.world["joints"][:, 1:]))


def test_scheduled_sampling_with_smpl_joint_feedback(setup):
    """The HuMoR-Qual TRAINING path: sched-samp with SMPL-joint feedback
    runs under jit+grad, changes the autoregressive trajectory, and leaves
    teacher-forced steps untouched."""
    cfg, params, body, models, world, meta = setup
    gender_ids = jnp.zeros_like(meta["gender_ids"])
    joint_fn = make_rollout_joint_fn(models, gender_ids, meta["betas"])

    from humor_tpu.data.windows import window_to_pairs
    data_in, data_out, _ = window_to_pairs(world)
    x_past = H.state_to_input(cfg, data_in)
    x_t = H.state_to_input(cfg, data_out)
    init_state = {k: v[:, 0] for k, v in data_in.items()}
    key = jax.random.PRNGKey(3)

    out_plain = H.scheduled_sampling(cfg, params, key, x_past, x_t,
                                     init_state, use_gt_p=0.0)
    out_qual = H.scheduled_sampling(cfg, params, key, x_past, x_t,
                                    init_state, use_gt_p=0.0,
                                    smpl_joint_fn=joint_fn)
    for v in jax.tree_util.tree_leaves(out_qual.pred):
        assert np.all(np.isfinite(np.asarray(v)))
    # step 0 is always teacher-forced -> identical
    np.testing.assert_allclose(np.asarray(out_plain.pred["trans"][:, 0]),
                               np.asarray(out_qual.pred["trans"][:, 0]),
                               atol=1e-6)
    # autoregressive steps see different (SMPL) joints -> diverge
    assert not np.allclose(np.asarray(out_plain.pred["trans"][:, 1:]),
                           np.asarray(out_qual.pred["trans"][:, 1:]))
    # fully teacher-forced: feedback path is irrelevant -> identical
    tf_plain = H.scheduled_sampling(cfg, params, key, x_past, x_t,
                                    init_state, use_gt_p=1.0)
    tf_qual = H.scheduled_sampling(cfg, params, key, x_past, x_t,
                                   init_state, use_gt_p=1.0,
                                   smpl_joint_fn=joint_fn)
    np.testing.assert_allclose(np.asarray(tf_plain.pred["trans"]),
                               np.asarray(tf_qual.pred["trans"]), atol=1e-6)


def test_qual_training_step(setup):
    """One jitted sched-samp training step with use_smpl_joint_inputs
    (the train_humor_qual.cfg path) produces a finite loss and updates."""
    cfg, params, body, models, world, meta = setup
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.train import step as TS

    batch = {}
    data_in, data_out, _ = __import__(
        "humor_tpu.data.windows", fromlist=["window_to_pairs"]
    ).window_to_pairs(world)
    batch = {"data_in": data_in, "data_out": data_out,
             "betas": meta["betas"], "gender_ids": meta["gender_ids"]}

    opt = TS.make_optimizer()
    state = TS.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    _, ss_step, _ = TS.make_train_steps(
        cfg, LossConfig(), opt, smpl_models=models,
        use_smpl_joint_inputs=True)
    new_state, stats = ss_step(state, batch, jax.random.PRNGKey(1), 15, 0.5)
    loss = float(np.asarray(stats["total_loss"]))
    assert np.isfinite(loss)
    assert np.isfinite(float(np.asarray(stats["grad_norm"])))
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_qual_requires_models():
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.train import step as TS

    with pytest.raises(ValueError):
        TS.sched_samp_loss_fn(H.HumorConfig(), LossConfig(), None,
                              use_smpl_joint_inputs=True)
