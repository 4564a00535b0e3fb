"""iMapper (i3DB) observation loader: OpenPose 2D + annotated 3D joints
for RGB fitting evaluation.

Behavioral parity target: /root/reference/humor/datasets/imapper_dataset.py
(GT joints + confidence->inf masking :174-203, irregular 7.5Hz->30Hz
alignment :213-229, occlusion masks :205-208, per-scene frame-shift
quirks :26-29).
"""

from __future__ import annotations

import glob
import json
import os.path as osp
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.data.rgb import read_keypoints, split_overlapping_windows


def parse_gt_skeleton(scene_info: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """i3DB GT json -> (joints3d (F, J, 3) with inf for unobserved,
    occlusion mask (F, J))."""
    joints3d = []
    for k, v in sorted(scene_info["3d"].items(), key=lambda kv: int(kv[0])):
        nj = len(v)
        dim = len(v[list(v.keys())[0]])
        pose = np.zeros((dim, nj), np.float32)
        for joint, pos in v.items():
            pose[:, int(joint)] = pos
        joints3d.append(pose.T)
    joints3d = np.stack(joints3d)
    F, J = joints3d.shape[:2]

    conf = np.zeros((F, J, 1), np.float32)
    for fid, v in enumerate(scene_info["confidence"]["values"]):
        for joint, jconf in v.items():
            conf[fid, int(joint)] = float(jconf)
    conf[conf == 0.0] = np.inf
    joints3d = joints3d * conf

    occ = np.zeros((F, J), np.int64)
    for k, v in scene_info.get("occluded", {}).items():
        occ[int(k) - 1] = v
    return joints3d, occ


def align_to_30hz(sub: np.ndarray, num_obs_frames: int) -> np.ndarray:
    """Place ~7.5 Hz GT annotations onto the 30 Hz observed timeline with
    the i3DB release's irregular early-frame pattern (reference :213-229).
    Unannotated frames are inf."""
    out = np.full((num_obs_frames,) + sub.shape[1:], np.inf, np.float64)
    n = sub.shape[0]
    pattern = [0, 2, 3, 5]
    for dst, src in zip(pattern, range(min(4, n))):
        if dst < num_obs_frames:
            out[dst] = sub[src]
    idx = 5
    for src in range(4, n):
        idx += 3
        if idx >= num_obs_frames:
            break
        out[idx] = sub[src]
    return out


@dataclass
class IMapperConfig:
    seq_len: int = 60
    overlap_len: int = 10
    img_width: int = 1920
    img_height: int = 1080


class IMapperDataset:
    """One i3DB scene -> observation windows + aligned GT."""

    def __init__(self, scene_dir: str, cfg: IMapperConfig,
                 gt_json: Optional[str] = None,
                 cam_mat: Optional[np.ndarray] = None):
        self.cfg = cfg
        keyp_paths = sorted(glob.glob(
            osp.join(scene_dir, "keypoints", "*_keypoints.json")))
        self.joints2d = (np.stack([read_keypoints(p) for p in keyp_paths])
                         if keyp_paths
                         else np.zeros((0, C.OP_NUM_JOINTS, 3), np.float32))
        self.num_frames = self.joints2d.shape[0]
        self.intervals, self.overlap = split_overlapping_windows(
            max(self.num_frames, 1), cfg.seq_len, cfg.overlap_len)

        self.gt_joints3d = None
        self.gt_occlusions = None
        if gt_json and osp.exists(gt_json):
            with open(gt_json) as f:
                info = json.load(f)
            j3d, occ = parse_gt_skeleton(info)
            self.gt_joints3d = align_to_30hz(j3d, self.num_frames)
            self.gt_occlusions = align_to_30hz(occ.astype(np.float64),
                                               self.num_frames)
        self.cam_mat = cam_mat

    def observation_batch(self) -> Tuple[Dict[str, np.ndarray],
                                         Dict[str, np.ndarray]]:
        T = min(self.cfg.seq_len, max(self.num_frames, 1))
        B = len(self.intervals)
        obs: Dict[str, np.ndarray] = {
            "joints2d": np.zeros((B, T, C.OP_NUM_JOINTS, 3), np.float32),
            "seq_interval": np.asarray(self.intervals, np.int32),
        }
        gt: Dict[str, np.ndarray] = {}
        if self.gt_joints3d is not None:
            nj = self.gt_joints3d.shape[1]
            gt["joints3d"] = np.full((B, T, nj, 3), np.inf, np.float32)
        for b, (s, e) in enumerate(self.intervals):
            obs["joints2d"][b, : e - s] = self.joints2d[s:e]
            if self.gt_joints3d is not None:
                gt["joints3d"][b, : e - s] = self.gt_joints3d[s:e]
        if self.cam_mat is not None:
            fx, fy = self.cam_mat[0, 0], self.cam_mat[1, 1]
            cx, cy = self.cam_mat[0, 2], self.cam_mat[1, 2]
            obs["cam_f"] = np.tile([fx, fy], (B, 1)).astype(np.float32)
            obs["cam_center"] = np.tile([cx, cy],
                                        (B, 1)).astype(np.float32)
        return obs, gt
