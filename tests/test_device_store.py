"""Device-resident window store (data/device_store.py): value parity
with the host gather path, noise semantics, budget gating, and the
train-CLI batch fn wired through it end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.data import dataset as D
from humor_tpu.data import device_store as DS
from humor_tpu.data.windows import window_to_pairs
from tests.test_dataset import _make_processed


@pytest.fixture(scope="module")
def dataset():
    return D.AmassDataset.from_processed(_make_processed())


@pytest.fixture(scope="module")
def staged(dataset):
    return DS.DeviceWindowStore.from_dataset(dataset)


def test_device_gather_matches_host(dataset, staged):
    """Same seed -> same sampled windows; the staged gather must
    reproduce the host gather bit-exactly at noise 0."""
    world_h, meta_h = dataset.sample_windows(7, 6, 11, noise_std=0.0)
    world_d, meta_d = staged.sample_windows(7, 6, 11, noise_std=0.0)
    assert set(world_d.keys()) == set(DS.TRAIN_COLUMNS)
    for k in world_d:
        np.testing.assert_array_equal(np.asarray(world_d[k]), world_h[k])
    np.testing.assert_array_equal(np.asarray(meta_d["betas"]),
                                  meta_h["betas"])
    np.testing.assert_array_equal(np.asarray(meta_d["gender_ids"]),
                                  meta_h["gender_ids"] % 2)


def test_device_pairs_match_host(dataset, staged):
    """Canonicalized training pairs agree between the two paths."""
    world_h, _ = dataset.sample_windows(3, 4, 11)
    world_h = {k: jnp.asarray(np.ascontiguousarray(world_h[k]))
               for k in DS.TRAIN_COLUMNS}
    world_d, _ = staged.sample_windows(3, 4, 11)
    in_h, out_h, _ = window_to_pairs(world_h)
    in_d, out_d, _ = window_to_pairs(world_d)
    for k in in_h:
        np.testing.assert_allclose(np.asarray(in_d[k]),
                                   np.asarray(in_h[k]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_d[k]),
                                   np.asarray(out_h[k]), atol=1e-6)


def test_device_noise_semantics(staged):
    """Noise is additive gaussian on every channel (host-gather parity)
    and deterministic in the seed."""
    w0, _ = staged.sample_windows(5, 8, 11, noise_std=0.0)
    w1, _ = staged.sample_windows(5, 8, 11, noise_std=0.05)
    w2, _ = staged.sample_windows(5, 8, 11, noise_std=0.05)
    deltas = np.concatenate([
        (np.asarray(w1[k]) - np.asarray(w0[k])).ravel() for k in w0])
    assert np.all(np.isfinite(deltas))
    assert 0.03 < deltas.std() < 0.07          # ~N(0, 0.05)
    assert abs(deltas.mean()) < 5e-3
    for k in w0:                               # same seed -> same draw
        np.testing.assert_array_equal(np.asarray(w1[k]),
                                      np.asarray(w2[k]))


def test_budget_gating(dataset):
    nbytes = DS.DeviceWindowStore.staged_nbytes(dataset)
    assert nbytes == dataset.store.shape[0] * 4 * sum(
        b - a for a, b in
        (D._FRAME_OFFSETS[c] for c in DS.TRAIN_COLUMNS))
    assert DS.maybe_stage(dataset, mode=0) is None
    assert DS.maybe_stage(dataset, mode=-1,
                          budget_bytes=nbytes - 1) is None
    st = DS.maybe_stage(dataset, mode=1, budget_bytes=0)
    assert st is not None                      # forced past the budget
    assert DS.maybe_stage(dataset, mode=-1,
                          budget_bytes=nbytes) is not None


def test_train_cli_batch_fn_device_path(dataset):
    """make_batch_fn(data_on_device=1) yields device-built batches that
    match the host path bit-for-bit and feed the train step."""
    from types import SimpleNamespace

    from humor_tpu.train.cli import make_batch_fn

    def cfg(on_device):
        return SimpleNamespace(batch_size=4, data_noise_std=0.0,
                               model_steps_in=1, data_on_device=on_device)

    dev = list(make_batch_fn(dataset, cfg(1), 11, 2, seed=3)(0))
    host = list(make_batch_fn(dataset, cfg(0), 11, 2, seed=3)(0))
    assert len(dev) == len(host) == 2
    for bd, bh in zip(dev, host):
        assert set(bd) == set(bh)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6), bd, bh)

    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.models import humor as H
    from humor_tpu.train import step as TS

    mcfg = H.HumorConfig()
    opt = TS.make_optimizer(lr=1e-4, steps_per_epoch=2)
    state = TS.init_train_state(mcfg, opt, jax.random.PRNGKey(0))
    sup, _, _ = TS.make_train_steps(mcfg, LossConfig(
        smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
        smpl_joint_consistency_loss=0.0), opt, None)
    state, stats = sup(state, dev[0], jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(stats["total_loss"]))


def test_chunk_gather_matches_stacked_batches(staged):
    """The fused (k, B) chunk gather equals k per-batch gathers stacked,
    bit-exactly at noise 0 (same host-sampled windows per seed)."""
    seeds = [11, 12, 13]
    world_c, meta_c = staged.sample_window_chunk(seeds, 5, 11)
    for j, s in enumerate(seeds):
        world_b, meta_b = staged.sample_windows(s, 5, 11)
        for k in world_b:
            np.testing.assert_array_equal(np.asarray(world_c[k])[j],
                                          np.asarray(world_b[k]))
        np.testing.assert_array_equal(np.asarray(meta_c["betas"])[j],
                                      np.asarray(meta_b["betas"]))
        np.testing.assert_array_equal(np.asarray(meta_c["gender_ids"])[j],
                                      np.asarray(meta_b["gender_ids"]))


def test_train_chunk_fn_matches_stacked_batch_fn(dataset):
    """make_batch_fns' chunk generator == Trainer-style stack_batches of
    the per-batch generator (full chunks AND the remainder singles)."""
    from types import SimpleNamespace

    from humor_tpu.train import step as TS
    from humor_tpu.train.cli import make_batch_fns

    cfg = SimpleNamespace(batch_size=4, data_noise_std=0.0,
                          model_steps_in=1, data_on_device=1)
    batches, chunks = make_batch_fns(dataset, cfg, 11, 5, seed=3)
    assert chunks is not None
    got = list(chunks(0, k=2))
    ref_batches = list(batches(0))
    assert [n for _, n in got] == [2, 2, 1]
    for ci, (payload, n) in enumerate(got):
        if n == 2:
            want = TS.stack_batches(ref_batches[ci * 2: ci * 2 + 2])
        else:
            want = ref_batches[4]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), payload, want)


def test_trainer_chunk_source_under_mesh(dataset, tmp_path):
    """The fused chunk source composes with DP sharding: the staged
    store lives on one device and shard_batch reshards each (k, B, ...)
    chunk across the mesh (batch axis 1)."""
    from types import SimpleNamespace

    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.models import humor as H
    from humor_tpu.train.cli import make_batch_fns
    from humor_tpu.train.trainer import TrainRunConfig, Trainer

    cfg = SimpleNamespace(batch_size=8, data_noise_std=0.0,
                          model_steps_in=1, data_on_device=1)
    batches, chunks = make_batch_fns(dataset, cfg, 11, 4, seed=3)
    rc = TrainRunConfig(out_dir=str(tmp_path / "mesh"), epochs=1,
                        val_every=10, save_every=10,
                        steps_per_dispatch=2, use_mesh=True)
    tr = Trainer(H.HumorConfig(),
                 LossConfig(smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
                            smpl_joint_consistency_loss=0.0),
                 rc, train_batches=batches, train_chunks=chunks,
                 steps_per_epoch=4, seed=0)
    out = tr.fit()
    assert np.isfinite(out["min_train_loss"])


def test_batch_fns_budget_passthrough(dataset):
    """A zero remaining budget forces the host path in auto mode (the
    CLI gives the val store only what the train store left)."""
    from types import SimpleNamespace

    from humor_tpu.train.cli import make_batch_fns

    cfg = SimpleNamespace(batch_size=2, data_noise_std=0.0,
                          model_steps_in=1, data_on_device=-1)
    _, chunks = make_batch_fns(dataset, cfg, 11, 1, seed=0,
                               budget_bytes=0)
    assert chunks is None
    _, chunks = make_batch_fns(dataset, cfg, 11, 1, seed=0)
    assert chunks is not None


def test_trainer_chunk_source_parity(dataset, tmp_path):
    """A Trainer fed the fused chunk source reaches bit-identical params
    to one stacking per-batch items itself (same k, same seeds)."""
    from types import SimpleNamespace

    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.models import humor as H
    from humor_tpu.train.cli import make_batch_fns
    from humor_tpu.train.trainer import TrainRunConfig, Trainer

    cfg = SimpleNamespace(batch_size=4, data_noise_std=0.0,
                          model_steps_in=1, data_on_device=1)
    mcfg = H.HumorConfig()
    lcfg = LossConfig(smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
                      smpl_joint_consistency_loss=0.0)

    def fit(use_chunks, out):
        batches, chunks = make_batch_fns(dataset, cfg, 11, 5, seed=3)
        # epoch 0 supervised (gt_p=1), epoch 1 scheduled sampling
        # (gt_p=0.5) — both multi-step programs consume the chunk source
        rc = TrainRunConfig(out_dir=str(tmp_path / out), epochs=2,
                            val_every=10, save_every=10,
                            sched_samp_start=1, sched_samp_end=3,
                            steps_per_dispatch=2, use_mesh=False)
        tr = Trainer(mcfg, lcfg, rc, train_batches=batches,
                     train_chunks=chunks if use_chunks else None,
                     steps_per_epoch=5, seed=0)
        tr.fit()
        return tr.state.params

    p_chunk = fit(True, "chunk")
    p_stack = fit(False, "stack")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_chunk, p_stack)
