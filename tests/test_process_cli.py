"""Preprocessing CLI round trip on synthetic raw AMASS files; profiling
helpers."""

import os

import numpy as np

from humor_tpu.data import process_amass as PA
from humor_tpu.utils.profiling import Timer


def _write_raw(path, frames=140, seed=0, gender="male"):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path,
             fps=60.0,
             gender=gender,
             trans=np.cumsum(rng.randn(frames, 3) * 0.01, axis=0),
             root_orient=rng.randn(frames, 3) * 0.2,
             pose_body=rng.randn(frames, 63) * 0.1,
             pose_hand=rng.randn(frames, 90) * 0.05,
             betas=rng.randn(16) * 0.3)


def test_process_amass_cli(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "out"
    _write_raw(str(raw / "CMU" / "01" / "seq1_poses.npz"), seed=0)
    _write_raw(str(raw / "CMU" / "01" / "seq2_poses.npz"), seed=1,
               gender="female")
    _write_raw(str(raw / "KIT" / "03" / "seq3_poses.npz"), seed=2)

    files = PA.enumerate_raw_files(str(raw))
    assert len(files) == 3

    n = PA.main(["--amass-root", str(raw), "--out", str(out),
                 "--smplh-root", "/nonexistent", "--workers", "2"])
    assert n == 3
    outs = PA.enumerate_raw_files  # noqa
    produced = []
    for root, _, names in os.walk(out):
        produced += [os.path.join(root, f) for f in names
                     if f.endswith(".npz")]
    assert len(produced) == 3
    # processed files load into the dataset
    from humor_tpu.data.dataset import AmassDataset, find_processed_files

    paths = find_processed_files(str(out))
    assert len(paths) == 3
    ds = AmassDataset.from_npz_files(paths)
    assert ds.num_seqs == 3
    assert ds.total_frames > 100


def test_timer():
    t = Timer()
    with t.section("a"):
        sum(range(1000))
    with t.section("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "b:" in rep
