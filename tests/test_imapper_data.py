"""iMapper loader pure logic: GT parsing, confidence masking, 30Hz
alignment pattern."""

import numpy as np

from humor_tpu.data import imapper as IM


def test_parse_gt_skeleton():
    info = {
        "3d": {
            "0": {"0": [1.0, 2.0, 3.0], "1": [4.0, 5.0, 6.0]},
            "1": {"0": [1.1, 2.1, 3.1], "1": [4.1, 5.1, 6.1]},
        },
        "confidence": {"values": [
            {"0": 1.0, "1": 0.0},   # joint 1 unobserved in frame 0
            {"0": 1.0, "1": 1.0},
        ]},
        "occluded": {"1": [0, 1]},
    }
    j3d, occ = IM.parse_gt_skeleton(info)
    assert j3d.shape == (2, 2, 3)
    np.testing.assert_allclose(j3d[0, 0], [1, 2, 3])
    assert np.isinf(j3d[0, 1]).all()
    np.testing.assert_allclose(j3d[1, 1], [4.1, 5.1, 6.1])
    np.testing.assert_array_equal(occ[0], [0, 1])


def test_align_to_30hz_pattern():
    sub = np.arange(8, dtype=np.float64)[:, None]  # 8 annotated frames
    out = IM.align_to_30hz(sub, 30)
    # irregular early pattern: 0->0, 1->2, 2->3, 3->5; then every 3
    assert out[0, 0] == 0 and out[2, 0] == 1
    assert out[3, 0] == 2 and out[5, 0] == 3
    assert out[8, 0] == 4 and out[11, 0] == 5 and out[14, 0] == 6
    # everything else is inf
    filled = [0, 2, 3, 5, 8, 11, 14, 17]
    mask = np.ones(30, bool)
    mask[filled] = False
    assert np.isinf(out[mask]).all()


# ---------------------------------------------------------------- GT floor

def _rot_y(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def test_obb_corners_and_lower():
    obb = IM.Obb(centroid=np.asarray([1.0, 2.0, 3.0], np.float32),
                 axes=np.eye(3, dtype=np.float32),
                 scales=np.asarray([2.0, 4.0, 6.0], np.float32))
    c = obb.corners_3d()
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.min(0), [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c.max(0), [2.0, 4.0, 6.0], atol=1e-6)
    # camera coords: -y is up, so 'lower' corners have the LARGEST y
    low = obb.corners_3d_lower()
    np.testing.assert_allclose(low[:, 1], 4.0, atol=1e-6)
    # consecutive lower corners share an edge (side <= diagonal)
    for i in range(4):
        side = np.linalg.norm(low[(i + 1) % 4] - low[i])
        diag = np.linalg.norm(low[(i + 2) % 4] - low[i])
        assert side <= diag + 1e-6


def test_gt_floor_fit_from_synthetic_boxes(tmp_path):
    """Boxes resting on a known tilted plane y = a*x + c*z + d -> the
    fitted floor matches (reference imapper_dataset.py:281-295)."""
    import json as J

    a, c, d = 0.05, -0.08, 2.0
    rng = np.random.RandomState(0)
    gt_dir = tmp_path / "Scene99" / "gt"
    gt_dir.mkdir(parents=True)
    names = []
    for i in range(6):
        x, z = rng.uniform(-3, 3, 2)
        y_floor = a * x + c * z + d
        h = rng.uniform(0.3, 1.0)
        # bottom face on the floor (y down in camera coords)
        centroid = [float(x), float(y_floor - h / 2), float(z)]
        axes = _rot_y(rng.uniform(0, np.pi))
        name = f"{i:02d}_chair_leg"
        with open(gt_dir / f"{name}.json", "w") as f:
            J.dump({"centroid": centroid, "axes": axes.tolist(),
                    "scales": [0.2, h, 0.2]}, f)
        names.append(name)

    # boxes are axis-rotated about y only, so their lower corners are NOT
    # exactly on the tilted plane; refit tolerance reflects that
    floor = IM.fit_gt_floor_from_scene(str(tmp_path / "Scene99"),
                                       "Scene99", obb_names=names)
    assert floor is not None and floor.shape == (4,)
    expected_n = np.asarray([a, -1.0, c])
    expected_n = expected_n / np.linalg.norm(expected_n)
    np.testing.assert_allclose(floor[:3], expected_n, atol=0.02)
    # plane convention: normal . p = offset for on-plane points
    p = np.asarray([1.0, a * 1.0 + c * (-2.0) + d, -2.0])
    assert abs(float(floor[:3] @ p) - float(floor[3])) < 0.05
    assert floor[1] < 0  # normal faces up (-y)


def test_dataset_emits_floor_plane(tmp_path):
    """IMapperDataset produces a floor_plane observation from scene boxes
    without any PlaneRCNN input."""
    import json as J

    scene = tmp_path / "Scene05"
    (scene / "keypoints").mkdir(parents=True)
    (scene / "gt").mkdir()
    kp = {"people": [{"pose_keypoints_2d": [100.0, 100.0, 0.9] * 25}]}
    for t in range(4):
        with open(scene / "keypoints" / f"f{t:04d}_keypoints.json",
                  "w") as f:
            J.dump(kp, f)
    with open(scene / "gt" / "00_couch_seat.json", "w") as f:
        J.dump({"centroid": [0.0, 1.75, 2.0],
                "axes": np.eye(3).tolist(),
                "scales": [1.0, 0.5, 1.0]}, f)

    ds = IM.IMapperDataset(str(scene), IM.IMapperConfig(seq_len=4))
    obs, _ = ds.observation_batch()
    assert "floor_plane" in obs
    # flat floor at y = 2.0 (box bottom): normal (0,-1,0), offset -2
    np.testing.assert_allclose(obs["floor_plane"][0],
                               [0.0, -1.0, 0.0, -2.0], atol=1e-4)
