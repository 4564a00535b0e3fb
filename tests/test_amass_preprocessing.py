"""AMASS preprocessing: floor/contact detection, 1-d clustering parity
with sklearn DBSCAN, velocity schemes, full process_sequence round trip
on synthetic raw data.
"""

import numpy as np
import pytest

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data import amass as A


def test_cluster_1d_matches_dbscan():
    from sklearn.cluster import DBSCAN
    rng = np.random.RandomState(0)
    vals = np.concatenate([rng.randn(40) * 0.001,
                           rng.randn(30) * 0.001 + 0.5,
                           [2.0]])  # lone outlier -> noise
    ours = A.cluster_1d(vals, eps=0.005, min_samples=3)
    ref = DBSCAN(eps=0.005, min_samples=3).fit(
        vals.reshape(-1, 1)).labels_
    # same partition (label ids may differ): compare co-membership
    for arr in (ours, ref):
        assert (arr == -1).sum() == 1
    same = (ours[:, None] == ours[None]) == (ref[:, None] == ref[None])
    assert same.all()


def test_floor_and_contacts_simple_standing():
    # person standing still: feet at z=0.03, root at z=0.9
    N = 60
    joints = np.zeros((N, C.NUM_SMPL_JOINTS, 3))
    joints[:, :, 2] = 0.9
    for name in ("leftFoot", "rightFoot"):
        joints[:, C.SMPL_JOINTS[name], 2] = 0.06
    for name in ("leftToeBase", "rightToeBase"):
        joints[:, C.SMPL_JOINTS[name], 2] = 0.03
    floor, contacts, discard = A.determine_floor_height_and_contacts(
        joints, fps=30)
    assert not discard
    assert abs(floor - (0.03 - A.FLOOR_HEIGHT_OFFSET)) < 1e-6
    for name in ("leftToeBase", "rightToeBase", "leftFoot", "rightFoot"):
        assert contacts[:, C.SMPL_JOINTS[name]].all(), name
    assert not contacts[:, C.SMPL_JOINTS["leftHand"]].any()


def test_terrain_discard():
    # half the time standing on a 0.3m platform with feet static
    N = 120
    joints = np.zeros((N, C.NUM_SMPL_JOINTS, 3))
    joints[:, :, 2] = 0.9
    feet = [C.SMPL_JOINTS[n] for n in
            ("leftToeBase", "rightToeBase", "leftFoot", "rightFoot")]
    joints[:, feet, 2] = 0.03
    joints[60:, :, 2] += 0.3  # including root
    floor, contacts, discard = A.determine_floor_height_and_contacts(
        joints, fps=30)
    assert discard


def test_estimate_velocity_central():
    t = np.arange(10, dtype=np.float64)
    seq = np.stack([t * 2.0, t * -1.0, t * 0.0], axis=-1)
    vel = A.estimate_velocity(seq, h=0.5)
    assert vel.shape == (8, 3)
    np.testing.assert_allclose(vel, np.tile([4.0, -2.0, 0.0], (8, 1)))


def test_process_sequence_round_trip():
    model = synthetic_smpl_model()
    rng = np.random.RandomState(1)
    N = 120
    raw = {
        "fps": np.asarray(60.0),
        "gender": "female",
        "trans": np.cumsum(rng.randn(N, 3) * 0.01, axis=0),
        "root_orient": rng.randn(N, 3) * 0.2,
        "pose_body": rng.randn(N, 63) * 0.1,
        "betas": rng.randn(16) * 0.3,
    }
    out = A.process_sequence(model, raw, out_fps=30,
                             discard_terrain=False)
    assert out is not None
    n = out["trans"].shape[0]
    # 120 -> middle 80% = 96 -> minus 2 edge = 94 -> 30/60 downsample = 47
    assert n == 47
    assert out["fps"] == 30.0
    assert out["joints"].shape == (n, C.NUM_SMPL_JOINTS, 3)
    assert out["joints_vel"].shape == (n, C.NUM_SMPL_JOINTS, 3)
    assert out["contacts"].shape == (n, C.NUM_SMPL_JOINTS)
    assert out["world2aligned_rot"].shape == (n, 3, 3)
    assert out["gender"] == "female"
    # floor: min joint z should be near 0 after floor removal
    assert out["joints"][..., 2].min() > -0.5

    # filename round trip
    name = A.output_filename("/tmp/seq", n, out["fps"])
    assert A.parse_filename(name) == (n, 30)


def test_process_discards_short():
    model = synthetic_smpl_model()
    rng = np.random.RandomState(2)
    raw = {
        "fps": np.asarray(60.0),
        "gender": "male",
        "trans": rng.randn(30, 3),
        "root_orient": rng.randn(30, 3) * 0.1,
        "pose_body": rng.randn(30, 63) * 0.1,
        "betas": rng.randn(16),
    }
    assert A.process_sequence(model, raw) is None
