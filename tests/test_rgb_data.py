"""RGB observation loader: window splitting parity, keypoint JSON
parsing, flip map, occlusion masking, full observation batch assembly."""

import json
import os

import numpy as np
import pytest

from humor_tpu.body_model import constants as C
from humor_tpu.data import rgb as R


def test_split_overlapping_windows_cover_everything():
    for n, sl, ov in [(150, 60, 10), (61, 60, 10), (200, 60, 10),
                      (179, 60, 10), (127, 40, 5)]:
        ivs, eff = R.split_overlapping_windows(n, sl, ov)
        assert ivs[0][0] == 0
        assert ivs[-1][1] == n
        for (s, e) in ivs:
            assert e - s == sl
        # consecutive windows overlap by >= requested
        for (s0, e0), (s1, e1) in zip(ivs, ivs[1:]):
            assert e0 - s1 >= ov, (n, sl, ov, ivs)


def test_split_short_video():
    ivs, eff = R.split_overlapping_windows(30, 60, 10)
    assert ivs == [(0, 30)]


def _write_keypoints(dirpath, t, kp):
    data = {"people": [{"pose_keypoints_2d": kp.reshape(-1).tolist()}]}
    path = os.path.join(dirpath, f"frame_{t:06d}_keypoints.json")
    with open(path, "w") as f:
        json.dump(data, f)


def test_read_keypoints(tmp_path):
    kp = np.arange(25 * 3, dtype=np.float32).reshape(25, 3)
    _write_keypoints(str(tmp_path), 0, kp)
    got = R.read_keypoints(
        os.path.join(str(tmp_path), "frame_000000_keypoints.json"))
    np.testing.assert_allclose(got, kp)
    # empty detection -> zeros
    with open(tmp_path / "empty_keypoints.json", "w") as f:
        json.dump({"people": []}, f)
    got = R.read_keypoints(str(tmp_path / "empty_keypoints.json"))
    np.testing.assert_array_equal(got, 0)


def test_flip_keypoints_involution():
    rng = np.random.RandomState(0)
    kp = rng.rand(25, 3).astype(np.float32) * 100
    flipped = R.flip_keypoints(kp, img_width=640)
    back = R.flip_keypoints(flipped, img_width=640)
    np.testing.assert_allclose(back, kp, atol=1e-3)
    # left/right pairs swapped: joint 2 (RShoulder) <-> 5 (LShoulder)
    np.testing.assert_allclose(flipped[2, 1:], kp[5, 1:])


def test_mask_occluded_joints():
    j2d = np.asarray([[5.0, 5.0, 0.9], [20.0, 20.0, 0.8]], np.float32)
    mask = np.zeros((32, 32), np.uint8)
    mask[18:24, 18:24] = 255  # occluder over the second joint
    out = R.mask_occluded_joints(j2d, mask)
    np.testing.assert_allclose(out[0], j2d[0])
    np.testing.assert_array_equal(out[1], 0)


def test_video_dataset_batch(tmp_path):
    rng = np.random.RandomState(0)
    n = 100
    for t in range(n):
        _write_keypoints(str(tmp_path), t,
                         rng.rand(25, 3).astype(np.float32) * 100)
    ds = R.RGBVideoDataset(str(tmp_path),
                           R.RGBVideoConfig(seq_len=60, overlap_len=10))
    obs = ds.observation_batch()
    B = obs["joints2d"].shape[0]
    assert obs["joints2d"].shape == (B, 60, 25, 3)
    assert obs["seq_interval"].shape == (B, 2)
    assert obs["floor_plane"].shape == (B, 4)
    assert obs["cam_f"].shape == (B, 2)
    assert obs["seq_interval"][0][0] == 0
    assert obs["seq_interval"][-1][1] == n


def test_video_dataset_no_split(tmp_path):
    """seq_len <= 0 = whole clip as ONE window (reference
    fit_rgb_demo_no_split.cfg semantics: no --rgb-seq-len)."""
    rng = np.random.RandomState(0)
    n = 100
    for t in range(n):
        _write_keypoints(str(tmp_path), t,
                         rng.rand(25, 3).astype(np.float32) * 100)
    ds = R.RGBVideoDataset(str(tmp_path),
                           R.RGBVideoConfig(seq_len=0, overlap_len=10))
    obs = ds.observation_batch()
    assert obs["joints2d"].shape == (1, n, 25, 3)
    assert tuple(obs["seq_interval"][0]) == (0, n)


def test_video_dataset_custom_intrinsics_and_masks(tmp_path):
    """cam_mat flows into cam_f/cam_center; person masks zero occluded
    joint confidences (the --rgb-intrinsics / --mask-path CLI plumbing)."""
    import cv2

    kp_dir = tmp_path / "kp"
    mask_dir = tmp_path / "masks"
    kp_dir.mkdir(), mask_dir.mkdir()
    n = 6
    kp = np.full((25, 3), 10.0, np.float32)
    kp[:, 2] = 0.9
    for t in range(n):
        _write_keypoints(str(kp_dir), t, kp)
    # occluder covering all joints in frame 0 only
    m = np.zeros((32, 32), np.uint8)
    m[:, :] = 255
    cv2.imwrite(str(mask_dir / "frame_000000.png"), m)
    cam = np.asarray([[500.0, 0, 16.0], [0, 400.0, 12.0], [0, 0, 1]],
                     np.float32)
    ds = R.RGBVideoDataset(str(kp_dir),
                           R.RGBVideoConfig(seq_len=0),
                           cam_mat=cam, mask_path=str(mask_dir))
    obs = ds.observation_batch()
    np.testing.assert_allclose(obs["cam_f"][0], [500.0, 400.0])
    np.testing.assert_allclose(obs["cam_center"][0], [16.0, 12.0])
    assert np.all(obs["joints2d"][0, 0, :, 2] == 0.0)   # masked frame
    assert np.all(obs["joints2d"][0, 1:, :, 2] == 0.9)  # untouched
