"""Data pipeline: native window sampler, pack/unpack round trip,
preprocessing -> dataset -> device canonicalization -> train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu import native
from humor_tpu.body_model import constants as C
from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data import amass as A
from humor_tpu.data import dataset as D
from humor_tpu.data.windows import window_to_pairs


def _make_processed(n_seqs=3, frames=150, seed=0):
    model = synthetic_smpl_model()
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n_seqs):
        raw = {
            "fps": np.asarray(60.0),
            "gender": ["male", "female", "neutral"][i % 3],
            "trans": np.cumsum(rng.randn(frames, 3) * 0.01, axis=0),
            "root_orient": rng.randn(frames, 3) * 0.2,
            "pose_body": rng.randn(frames, 63) * 0.1,
            "betas": rng.randn(16) * 0.3,
        }
        seq = A.process_sequence(model, raw, discard_terrain=False)
        assert seq is not None
        out.append(seq)
    return out


@pytest.fixture(scope="module")
def dataset():
    return D.AmassDataset.from_processed(_make_processed())


def test_native_lib_builds():
    assert native.native_available()


def test_pack_unpack_round_trip(dataset):
    world = dataset.sequence(0)
    assert set(world.keys()) == set(n for n, _ in D._FRAME_LAYOUT)
    assert world["trans"].shape[-1] == 3
    assert world["root_orient"].shape[-1] == 9
    assert world["pose_body"].shape[-1] == 189
    assert world["contacts"].shape[-1] == 9
    # rotations are valid
    R = world["root_orient"].reshape(-1, 3, 3)
    RtR = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (len(R), 1, 1)),
                               atol=1e-5)


def test_sample_windows_shapes(dataset):
    world, meta = dataset.sample_windows(seed=0, batch=16, window_frames=11)
    assert world["trans"].shape == (16, 11, 3)
    assert world["joints"].shape == (16, 11, 66)
    assert meta["betas"].shape == (16, 16)
    assert meta["gender_ids"].shape == (16,)
    # windows stay inside their sequences
    for b in range(16):
        assert meta["start"][b] + 11 <= dataset.lengths[meta["seq_idx"][b]]


def test_sampling_deterministic(dataset):
    w1, m1 = dataset.sample_windows(seed=7, batch=8, window_frames=5)
    w2, m2 = dataset.sample_windows(seed=7, batch=8, window_frames=5)
    np.testing.assert_array_equal(w1["trans"], w2["trans"])
    w3, _ = dataset.sample_windows(seed=8, batch=8, window_frames=5)
    assert not np.array_equal(w1["trans"], w3["trans"])


def test_noise_applied(dataset):
    w0, _ = dataset.sample_windows(seed=3, batch=4, window_frames=5)
    w1, _ = dataset.sample_windows(seed=3, batch=4, window_frames=5,
                                   noise_std=0.01)
    d = w1["trans"] - w0["trans"]
    assert 0.003 < float(np.abs(d).std()) < 0.03


def test_pipeline_to_train_step(dataset):
    """Full path: sample -> device canonicalization -> supervised step."""
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.models import humor as H
    from humor_tpu.train import step as TS

    world_np, meta = dataset.sample_windows(seed=1, batch=4,
                                            window_frames=6)
    world = {k: jnp.asarray(v) for k, v in world_np.items()}
    keep = ("trans", "trans_vel", "root_orient", "root_orient_vel",
            "pose_body", "joints", "joints_vel", "contacts")
    world = {k: world[k] for k in keep}
    data_in, data_out, _ = jax.jit(window_to_pairs)(world)
    batch = {
        "data_in": data_in,
        "data_out": data_out,
        "betas": jnp.asarray(meta["betas"]),
        "gender_ids": jnp.asarray(meta["gender_ids"]),
    }
    cfg = H.HumorConfig()
    opt = TS.make_optimizer()
    state = TS.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    sup_step, _, _ = TS.make_train_steps(cfg, LossConfig(), opt, None)
    state, stats = sup_step(state, batch, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(stats["total_loss"]))


def test_split_files_modes():
    from humor_tpu.data.dataset import split_files

    paths = [f"/root/amass/{ds}/{subj}/seq{i}_100_frames_30_fps.npz"
             for ds in ("CMU", "KIT", "ACCAD")
             for subj in ("01", "02")
             for i in range(3)]
    # subject split: all of one subject's files land in one partition
    sp = split_files(paths, "subject", seed=0)
    assert sorted(sp["train"] + sp["val"] + sp["test"]) == sorted(paths)
    import os as _os
    for part in sp.values():
        subs = {_os.path.dirname(p) for p in part}
        for other_name, other in sp.items():
            if other is part:
                continue
            assert not subs & {_os.path.dirname(p) for p in other}
    # dataset split keeps whole datasets together
    sd = split_files(paths, "dataset", seed=0)
    for part in sd.values():
        dsets = {p.split("/")[3] for p in part}
        others = [q for name, v in sd.items() if v is not part
                  for q in v]
        assert not dsets & {q.split("/")[3] for q in others}
    # single: everything everywhere
    ss = split_files(paths, "single")
    assert ss["train"] == paths and ss["test"] == paths
