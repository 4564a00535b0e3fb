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
