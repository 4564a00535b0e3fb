"""make_multi_steps parity: k scanned steps must equal k sequential
single steps (same params trajectory, same stats), for both phases, and
compose with the dp mesh (reference has no equivalent — its loop is
host-driven per step, train_humor.py:191-241; the scan is the TPU-native
dispatch-amortized form)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.data.windows import window_to_pairs
from humor_tpu.losses.elbo import LossConfig
from humor_tpu.models import humor as H
from humor_tpu.parallel.mesh import make_mesh, shard_batch
from humor_tpu.train import step as TS

CFG = H.HumorConfig()
MODEL = synthetic_smpl_model()
K = 3


def make_batch(seed, B=8, T=4):
    world, meta = synthetic_world_batch(seed, B, T + 1, model=MODEL)
    data_in, data_out, _ = window_to_pairs(world)
    return {"data_in": data_in, "data_out": data_out,
            "betas": meta["betas"], "gender_ids": meta["gender_ids"]}


@pytest.fixture(scope="module")
def setup():
    opt = TS.make_optimizer(lr=1e-3, steps_per_epoch=10)
    sup, ss, _ = TS.make_train_steps(CFG, LossConfig(), opt, None)
    multi_sup, multi_ss = TS.make_multi_steps(sup, ss, K)
    batches = [make_batch(s) for s in range(K)]
    # fresh state per use: multi_* donates its state argument
    fresh = lambda: TS.init_train_state(CFG, opt, jax.random.PRNGKey(0))
    return fresh, sup, ss, multi_sup, multi_ss, batches


def _max_param_diff(a, b):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
    return max(jax.tree_util.tree_leaves(diffs))


def test_multi_sup_matches_singles(setup):
    fresh, sup, _, multi_sup, _, batches = setup
    key = jax.random.PRNGKey(42)

    st_seq = fresh()
    keys = jax.random.split(key, K)
    losses_seq = []
    for b, k_i in zip(batches, keys):
        st_seq, stats = sup(st_seq, b, k_i, 3)
        losses_seq.append(float(stats["total_loss"]))

    stacked = TS.stack_batches(batches)
    st_multi, stats_k = multi_sup(fresh(), stacked, key, 3)

    assert int(st_multi.step) == int(st_seq.step)
    np.testing.assert_allclose(np.asarray(stats_k["total_loss"]),
                               losses_seq, rtol=2e-4)
    # fp-reassociation between the scanned and single-step programs
    # compounds through 3 adamax updates; parity is ~1e-4-scale
    assert _max_param_diff(st_seq.params, st_multi.params) < 5e-4


def test_multi_ss_matches_singles(setup):
    fresh, _, ss, _, multi_ss, batches = setup
    key = jax.random.PRNGKey(7)

    st_seq = fresh()
    keys = jax.random.split(key, K)
    losses_seq = []
    for b, k_i in zip(batches, keys):
        st_seq, stats = ss(st_seq, b, k_i, 12, 0.5)
        losses_seq.append(float(stats["total_loss"]))

    stacked = TS.stack_batches(batches)
    st_multi, stats_k = multi_ss(fresh(), stacked, key, 12, 0.5)

    np.testing.assert_allclose(np.asarray(stats_k["total_loss"]),
                               losses_seq, rtol=2e-4)
    assert _max_param_diff(st_seq.params, st_multi.params) < 5e-4


def test_multi_step_sharded_runs(setup):
    fresh, *_, batches = setup
    mesh = make_mesh()
    opt = TS.make_optimizer(lr=1e-3, steps_per_epoch=10)
    msup, _ = TS.make_multi_steps(
        *TS.make_train_steps(CFG, LossConfig(), opt, None, mesh=mesh)[:2],
        K)
    stacked = shard_batch(mesh, TS.stack_batches(batches),
                          batch_axis_index=1)
    st, stats_k = msup(TS.init_train_state(CFG, opt, jax.random.PRNGKey(0)),
                       stacked, jax.random.PRNGKey(0), 3)
    assert np.all(np.isfinite(np.asarray(stats_k["total_loss"])))
    assert int(st.step) == K
