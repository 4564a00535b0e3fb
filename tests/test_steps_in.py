"""steps_in > 1 (multi-frame past windows; reference humor_model.py
:104-176): window packing, rollout/sched-samp/infer generalization, and
a full training step at steps_in=2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.data.windows import window_to_pairs, window_to_pairs_multi
from humor_tpu.models import humor as H

B, F = 3, 8
S = 2


@pytest.fixture(scope="module")
def world():
    return synthetic_world_batch(0, B, F)[0]


@pytest.fixture(scope="module")
def setup():
    cfg = H.HumorConfig(steps_in=S)
    params = H.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_input_dims(setup):
    cfg, params = setup
    assert cfg.past_data_dim == S * cfg.input_data_dim
    assert params["prior"][0]["w"].shape[0] == cfg.past_data_dim


def test_window_pairs_multi_matches_single(world):
    """window_to_pairs_multi at S=1 reproduces window_to_pairs (modulo
    the singleton window axis)."""
    d1_in, d1_out, _ = window_to_pairs(world)
    dm_in, dm_out = window_to_pairs_multi(world, 1)
    for k in d1_in:
        np.testing.assert_allclose(np.asarray(dm_in[k][..., 0, :]),
                                   np.asarray(d1_in[k]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dm_out[k]),
                                   np.asarray(d1_out[k]), atol=1e-5)


def test_window_pairs_multi_layout(world):
    """For S=2: window frame s of pair i equals frame i+s canonicalized
    to frame i+S-1 — the newest window frame sits at the canonical
    origin exactly like the single-step data_in."""
    dm_in, dm_out = window_to_pairs_multi(world, S)
    T = F - S
    assert dm_in["trans"].shape == (B, T, S, 3)
    assert dm_out["trans"].shape == (B, T, 3)
    d1_in, d1_out, _ = window_to_pairs(world)
    # pair i's NEWEST window frame (index S-1) == single-step data_in at
    # step i+S-1 (both canonicalize frame i+S-1 into its own frame)
    for k in dm_in:
        np.testing.assert_allclose(
            np.asarray(dm_in[k][:, :, S - 1]),
            np.asarray(d1_in[k][:, S - 1:]), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(dm_out[k]),
            np.asarray(d1_out[k][:, S - 1:]), atol=1e-4)


def test_rollout_steps_in_2(setup, world):
    cfg, params = setup
    init = {k: v[:, :S] for k, v in world.items()
            if k in cfg.input_spec.names}
    roll = H.rollout(cfg, params, jax.random.PRNGKey(1), init, 5,
                     use_mean=True, canonicalize_input=True)
    assert roll.world["trans"].shape == (B, 5, 3)
    for v in jax.tree_util.tree_leaves(roll.world):
        assert np.all(np.isfinite(np.asarray(v)))
    # world-frame equivariance: +5m translation of the initial window
    # shifts the rollout by +5m (the canonicalization probe)
    shift = jnp.asarray([5.0, 5.0, 0.0])
    init_shifted = dict(init)
    init_shifted["trans"] = init["trans"] + shift
    init_shifted["joints"] = (init["joints"].reshape(B, S, -1, 3)
                              + shift).reshape(B, S, -1)
    roll2 = H.rollout(cfg, params, jax.random.PRNGKey(1), init_shifted, 5,
                      use_mean=True, canonicalize_input=True,
                      uncanonicalize_output=True)
    roll1 = H.rollout(cfg, params, jax.random.PRNGKey(1), init, 5,
                      use_mean=True, canonicalize_input=True,
                      uncanonicalize_output=True)
    np.testing.assert_allclose(np.asarray(roll2.world["trans"]),
                               np.asarray(roll1.world["trans"] + shift),
                               atol=2e-3)


def test_infer_global_seq_steps_in_2(setup, world):
    cfg, params = setup
    res = H.infer_global_seq(cfg, params, world)
    assert res.posterior[0].shape == (B, F - S, cfg.latent_size)
    for v in (res.posterior + res.prior):
        assert np.all(np.isfinite(np.asarray(v)))


def test_scheduled_sampling_and_train_step_steps_in_2(setup, world):
    cfg, params = setup
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.train import step as TS

    data_in, data_out = window_to_pairs_multi(world, S)
    meta_betas = jnp.zeros((B, 16))
    batch = {"data_in": data_in, "data_out": data_out,
             "betas": meta_betas,
             "gender_ids": jnp.zeros((B,), jnp.int32)}
    loss_cfg = LossConfig(smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
                          smpl_joint_consistency_loss=0.0)
    opt = TS.make_optimizer()
    state = TS.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    sup_step, ss_step, _ = TS.make_train_steps(cfg, loss_cfg, opt, None)
    state, stats = sup_step(state, batch, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(np.asarray(stats["total_loss"])))
    state, stats = ss_step(state, batch, jax.random.PRNGKey(2), 15, 0.5)
    assert np.isfinite(float(np.asarray(stats["total_loss"])))
