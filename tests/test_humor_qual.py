"""HuMoR-Qual: SMPL-joint feedback inside the rollout scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.gendered import make_rollout_joint_fn
from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.models import humor as H


def test_rollout_with_smpl_joint_feedback():
    cfg = H.HumorConfig()
    params = H.init_params(cfg, jax.random.PRNGKey(0))
    body = synthetic_smpl_model()
    models = {"male": body,
              "female": synthetic_smpl_model(jax.random.PRNGKey(7))}
    world, meta = synthetic_world_batch(0, 3, 2, model=body)
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
    # feedback changes the fed-back joints and therefore the trajectory
    assert not np.allclose(np.asarray(roll_plain.world["joints"]),
                           np.asarray(roll_qual.world["joints"]))
    # joints at each step equal the SMPL forward of that step's params in
    # the world frame
    w = roll_qual.world
    B, T = w["trans"].shape[:2]
    jfn_world = make_rollout_joint_fn(models, gender_ids, meta["betas"])
    for t in range(T):
        expect = jfn_world(w["trans"][:, t], w["root_orient"][:, t],
                           w["pose_body"][:, t])
        np.testing.assert_allclose(np.asarray(w["joints"][:, t]),
                                   np.asarray(expect), atol=2e-4)
