"""Sharded TTO: the window batch shards over the 8-device CPU mesh and
the overlap-consistency coupling (cross-shard batch indexing) compiles to
collectives and executes correctly (same result as unsharded).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.fitting import energies as E
from humor_tpu.fitting import optimizer as O
from humor_tpu.models import humor as H
from humor_tpu.models import vposer as vp
from humor_tpu.parallel.mesh import make_mesh

B, T = 8, 4  # one window per device


@pytest.fixture(scope="module")
def models():
    vcfg = vp.VPoserConfig(hidden=32)
    hcfg = H.HumorConfig()
    return O.TTOModels(
        body=synthetic_smpl_model(),
        vposer_cfg=vcfg,
        vposer=vp.init_params(vcfg, jax.random.PRNGKey(1)),
        humor_cfg=hcfg,
        humor=H.init_params(hcfg, jax.random.PRNGKey(2)),
    )


@pytest.fixture(scope="module")
def observed(models):
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(B, T, models.vposer_cfg.latent_dim) * 0.3,
                    jnp.float32)
    pose = vp.latent2pose(models.vposer_cfg, models.vposer, z)
    trans = jnp.asarray(rng.randn(B, T, 3) * 0.1, jnp.float32)
    ro = jnp.asarray(rng.randn(B, T, 3) * 0.2, jnp.float32)
    pred = O.smpl_results(models.body, trans, ro, pose,
                          jnp.zeros((B, C.BETA_SIZE)))
    # consecutive windows sharing 2 overlap frames
    iv = np.stack([np.arange(B) * (T - 2),
                   np.arange(B) * (T - 2) + T], axis=1)
    return {
        "joints3d": pred["joints3d"],
        "verts3d": pred["verts3d"],
        "seq_interval": jnp.asarray(iv, jnp.int32),
    }


def _cfg():
    w1 = E.StageWeights(joints3d=1.0, rgb_overlap_consist=1.0)
    w2 = E.StageWeights(joints3d=1.0, pose_prior=4e-4,
                        rgb_overlap_consist=1.0)
    w3 = E.StageWeights(joints3d=1.0, motion_prior=1e-4,
                        joint_consistency=1.0)
    # zoom linesearch: its accepted step size shifts only continuously
    # under the reduction-reassociation drift sharding introduces, so
    # plain-vs-sharded stays comparable. The parallel search picks from a
    # DISCRETE candidate grid — a knife-edge Wolfe boundary can flip the
    # chosen candidate between equally-valid steps and the trajectories
    # (not the quality) diverge, which is not what this test pins down.
    return O.TTOConfig(seq_len=T, stage_weights=(w1, w2, w3),
                       num_iters=(2, 2, 2),
                       stage3_tune_init_state=False,
                       lbfgs_linesearch="zoom")


def test_sharded_matches_unsharded(models, observed):
    assert jax.device_count() >= 8, "conftest should give 8 CPU devices"
    cfg = _cfg()
    res_plain = O.make_runner(cfg, models)(observed)
    mesh = make_mesh(jax.devices()[:8])
    res_shard = O.make_runner(cfg, models, mesh=mesh)(observed)

    for k in ("trans", "root_orient", "pose_body"):
        np.testing.assert_allclose(
            np.asarray(res_plain.final[k]), np.asarray(res_shard.final[k]),
            atol=2e-3, rtol=1e-2)
    for stage in ("stage1", "stage2", "stage3"):
        a = np.asarray(res_plain.losses[stage])
        b = np.asarray(res_shard.losses[stage])
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-3)


def test_sharded_early_exit_compiles_and_runs(models, observed):
    """The convergence early exit replaces the iteration scan with a
    lax.while_loop; its predicate is a replicated scalar, so it must
    compile and execute under the windows-sharded mesh (collectives
    inside the loop body, global trip count). Pins finiteness + the same
    loose agreement with the unsharded tolerance run."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), lbfgs_tol_grad=1e-7,
                              lbfgs_tol_change=1e-9)
    res_plain = O.make_runner(cfg, models)(observed)
    mesh = make_mesh(jax.devices()[:8])
    res_shard = O.make_runner(cfg, models, mesh=mesh)(observed)
    for k in ("trans", "root_orient", "pose_body"):
        a, b = np.asarray(res_plain.final[k]), np.asarray(res_shard.final[k])
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-2)
