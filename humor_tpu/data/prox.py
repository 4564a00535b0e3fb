"""PROX RGB-D observation loader: Kinect depth + OpenPose 2D -> masked,
backprojected point clouds and keypoints for TTO.

Behavioral parity target: /root/reference/humor/datasets/prox_dataset.py
(Projection calibration :443-548 — undistort/unproject/reproject; depth
point-cloud capped at max_pts=4096 :319-349; flip handling :276-281;
mask occlusion :284-290; RANSAC floor-from-scene :360-427 simplified;
gender from subject id :430-434; 90-frame edge trim :18).

Data layout is the public PROX release. cv2 is required only for the
undistortion path; everything else is numpy.
"""

from __future__ import annotations

import glob
import json
import os
import os.path as osp
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.data.rgb import (flip_keypoints, mask_occluded_joints,
                                read_keypoints, split_overlapping_windows)

TRIM_EDGES = 90          # reference prox_dataset.py:18
MAX_POINTS = 4096        # reference :319
FEMALE_SUBJECTS = [162, 3452, 159, 3403]  # reference :48


def gender_of_subject(subject_id: int) -> str:
    return "female" if subject_id in FEMALE_SUBJECTS else "male"


# PROX/PROXD pickle key -> our naming (reference prox_dataset.py:34-40);
# 'betas' appears under two names across the releases
SMPL_NAME_MAP = {"transl": "trans", "beta": "betas", "betas": "betas",
                 "body_pose": "pose_body", "global_orient": "root_orient"}
SMPL_SIZES = {"trans": 3, "betas": 10, "pose_body": 63, "root_orient": 3}


def read_fitting_seq(fitting_paths: List[str], return_valid: bool = False):
    """Read a sequence of PROX/PROXD per-frame SMPL fit pickles into one
    stacked dict (reference read_fitting_seq, prox_dataset.py:52-89):
    missing files and fits containing non-finite values are dummy-filled
    with zeros and flagged invalid. Returns {trans (T, 3), betas (T, 10),
    pose_body (T, 63), root_orient (T, 3)} (+ valid bool list)."""
    import pickle

    fit = {k: [] for k in SMPL_SIZES}
    valid: List[bool] = []
    for fpath in fitting_paths:
        if not os.path.exists(fpath):
            print(f"No PROX results exist for {fpath}, filling with "
                  "dummy zeros!")
            for k, size in SMPL_SIZES.items():
                fit[k].append(np.zeros((size,), np.float32))
            valid.append(False)
            continue
        with open(fpath, "rb") as f:
            param = pickle.load(f, encoding="latin1")
        # gather the frame's components first, then append atomically:
        # a pickle missing one SMPL key (or carrying a non-finite value)
        # must not leave that component's list shorter than the others —
        # np.stack would raise or rows would misalign across frames
        # (advisor finding; the reference shares this weakness)
        frame: Dict[str, np.ndarray] = {}
        for key, name in SMPL_NAME_MAP.items():
            if key not in param or name in frame:
                continue
            frame[name] = np.asarray(param[key], np.float32).reshape(-1)
        cur_valid = (
            set(frame) == set(SMPL_SIZES)
            and all(v.shape == (SMPL_SIZES[k],) and np.isfinite(v).all()
                    for k, v in frame.items()))
        if not cur_valid:
            print(f"PROX results missing/nan for {fpath}, filling with "
                  "dummy zeros!")
        for name, size in SMPL_SIZES.items():
            fit[name].append(frame[name] if cur_valid
                             else np.zeros((size,), np.float32))
        valid.append(cur_valid)
    out = {k: np.stack(v).astype(np.float32) if v
           else np.zeros((0, SMPL_SIZES[k]), np.float32)
           for k, v in fit.items()}
    if return_valid:
        return out, valid
    return out


class Projection:
    """Kinect calibration: unproject depth to 3D, project to color frame
    (reference Projection :443-548)."""

    def __init__(self, calib_dir: str):
        with open(osp.join(calib_dir, "IR.json")) as f:
            self.depth_cam = json.load(f)
        with open(osp.join(calib_dir, "Color.json")) as f:
            self.color_cam = json.load(f)

    def unproject_depth_image(self, depth: np.ndarray,
                              cam: Dict) -> np.ndarray:
        import cv2

        h, w = depth.shape
        us = np.arange(depth.size) % w
        vs = np.arange(depth.size) // w
        ds = depth.ravel()
        uv = np.stack([us, vs], axis=-1).astype(np.float64)
        xy = cv2.undistortPoints(
            uv.reshape(1, -1, 2), np.asarray(cam["camera_mtx"]),
            np.asarray(cam["k"])).squeeze(0)
        xyz = np.concatenate([xy, ds[:, None]], axis=-1)
        xyz[:, :2] *= xyz[:, 2:3]
        view = np.asarray(cam["view_mtx"])
        xyz = (xyz - view[:, 3][None]) @ view[:, :3]
        return xyz.reshape(h, w, 3)

    def project_points(self, pts: np.ndarray, cam: Dict) -> np.ndarray:
        import cv2

        return cv2.projectPoints(
            pts.reshape(-1, 3).copy(), np.asarray(cam["R"], np.float64),
            np.asarray(cam["T"], np.float64),
            np.asarray(cam["camera_mtx"]),
            np.asarray(cam["k"]))[0].squeeze(1)

    def masked_point_cloud(self, depth: np.ndarray, mask: np.ndarray,
                           max_pts: int = MAX_POINTS,
                           seed: int = 0) -> np.ndarray:
        """Person point cloud in the color-camera frame: zero out masked
        (non-person) depth, unproject, subsample to max_pts with inf
        padding (reference :319-349)."""
        d = depth.copy()
        d[mask != 0] = 0.0
        pts = self.unproject_depth_image(d, self.depth_cam).reshape(-1, 3)
        pts = pts[d.ravel() > 1e-2]
        view = np.asarray(self.color_cam["view_mtx"])
        if pts.shape[0]:
            pts = pts @ view[:, :3].T + view[:, 3][None]
        return subsample_points(pts, max_pts, seed)


def subsample_points(pts: np.ndarray, max_pts: int,
                     seed: int = 0) -> np.ndarray:
    """Fixed-size point set: random subsample when over, inf-pad when
    under (static shapes for jit; the fitting losses mask inf)."""
    rng = np.random.RandomState(seed)
    out = np.full((max_pts, 3), np.inf, np.float32)
    n = pts.shape[0]
    if n == 0:
        return out
    if n > max_pts:
        sel = rng.choice(n, max_pts, replace=False)
        out[:] = pts[sel]
    else:
        out[:n] = pts
    return out


def fit_floor_ransac(points: np.ndarray, n_iters: int = 200,
                     thresh: float = 0.05, seed: int = 0,
                     min_up: float = 0.7) -> np.ndarray:
    """RANSAC plane fit over scene points -> (a, b, c, d) with the normal
    flipped up in the camera frame (-y), replacing the reference's
    RANSACRegressor+DBSCAN pipeline (:360-427) with a direct plane
    RANSAC.

    `min_up` rejects candidate planes whose normal is not mostly
    vertical (|n_y| < min_up): the reference's RANSACRegressor fits
    y = f(x, z), which structurally cannot select a wall — this filter
    reproduces that floor bias (without it, a dominant wall would win
    the inlier vote). Among floor-ish candidates it then prefers the
    LOWEST plane (largest camera-frame y) when inlier counts are close,
    standing in for the reference's DBSCAN pick of the lowest height
    cluster (prox_dataset.py:399-427)."""
    rng = np.random.RandomState(seed)
    candidates = []  # (inliers, height_y, plane)
    n = points.shape[0]
    for _ in range(n_iters):
        idx = rng.choice(n, 3, replace=False)
        p0, p1, p2 = points[idx]
        normal = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(normal)
        if norm < 1e-9:
            continue
        normal = normal / norm
        if abs(normal[1]) < min_up:
            continue  # wall/furniture side — the reference can't fit it
        d = float(normal @ p0)
        dist = np.abs(points @ normal - d)
        inliers = int((dist < thresh).sum())
        height = d / normal[1]  # plane height along +y (down = lower)
        candidates.append((inliers, height, np.concatenate([normal, [d]])))
    if not candidates:
        return np.asarray([0.0, -1.0, 0.0, 0.5], np.float32)
    max_inliers = max(c[0] for c in candidates)
    # among comparably-supported planes, take the LOWEST one (tabletops
    # and seats can out-vote the floor when furniture dominates a view)
    strong = [c for c in candidates if c[0] >= 0.9 * max_inliers]
    best = max(strong, key=lambda c: c[1])[2]
    # least-squares refit on the consensus set (RANSACRegressor's final
    # estimator step): y = a*x + c*z + d over the inliers
    from humor_tpu.data.imapper import fit_floor_plane_from_points

    dist = np.abs(points @ best[:3] - best[3])
    inl = points[dist < thresh]
    if inl.shape[0] >= 3:
        return fit_floor_plane_from_points(inl)
    if best[1] > 0:  # normal must face up (camera -y)
        best = -best
    return best.astype(np.float32)


@dataclass
class ProxConfig:
    seq_len: int = 60
    overlap_len: int = 10
    max_points: int = MAX_POINTS
    use_depth: bool = True
    flip: bool = True          # PROX images are mirrored
    img_width: int = 1920
    img_height: int = 1080
    # load PROXD (qualitative) / MoSh (quantitative) per-frame SMPL fits
    # as pseudo-GT (reference prox_dataset.py:111-147 return_fitting)
    load_fitting: bool = False


class ProxDataset:
    """One PROX recording -> observation windows. Expects the public PROX
    layout: recordings/<name>/{keypoints,Depth,BodyIndex}/..., calibration/
    <cam>/ {IR,Color}.json."""

    def __init__(self, recording_dir: str, calib_dir: str,
                 cfg: ProxConfig, cam_mat: Optional[np.ndarray] = None,
                 fitting_root: Optional[str] = None):
        self.cfg = cfg
        self.recording_dir = recording_dir
        # default pseudo-GT location in the public layout:
        # <dataset>/fittings/{mosh|proxd}/<rec>/results/<frame>/000.pkl
        if fitting_root is None and cfg.load_fitting:
            base = osp.dirname(osp.dirname(recording_dir.rstrip("/")))
            for sub in ("mosh", "proxd"):
                cand = osp.join(base, "fittings", sub)
                if osp.isdir(cand):
                    fitting_root = cand
                    break
        self.fitting_root = fitting_root
        self.projection = (Projection(calib_dir)
                           if osp.isdir(calib_dir) else None)
        keyp_paths = sorted(glob.glob(
            osp.join(recording_dir, "keypoints", "*_keypoints.json")))
        keyp_paths = keyp_paths[TRIM_EDGES:-TRIM_EDGES] \
            if len(keyp_paths) > 2 * TRIM_EDGES else keyp_paths
        self.keyp_paths = keyp_paths
        frames = np.stack([read_keypoints(p) for p in keyp_paths]) \
            if keyp_paths else np.zeros((0, C.OP_NUM_JOINTS, 3), np.float32)
        if cfg.flip and frames.size:
            frames = flip_keypoints(frames, cfg.img_width)
        self.joints2d = frames
        self.num_frames = frames.shape[0]
        self.intervals, self.overlap = split_overlapping_windows(
            max(self.num_frames, 1), cfg.seq_len, cfg.overlap_len)
        if cam_mat is None and self.projection is not None:
            cam_mat = np.asarray(
                self.projection.color_cam["camera_mtx"], np.float32)
        self.cam_mat = cam_mat

    def observation_batch(self) -> Dict[str, np.ndarray]:
        T = min(self.cfg.seq_len, max(self.num_frames, 1))
        B = len(self.intervals)
        out: Dict[str, np.ndarray] = {
            "joints2d": np.zeros((B, T, C.OP_NUM_JOINTS, 3), np.float32),
            "seq_interval": np.asarray(self.intervals, np.int32),
        }
        for b, (s, e) in enumerate(self.intervals):
            out["joints2d"][b, : e - s] = self.joints2d[s:e]
        if self.cam_mat is not None:
            fx, fy = self.cam_mat[0, 0], self.cam_mat[1, 1]
            cx, cy = self.cam_mat[0, 2], self.cam_mat[1, 2]
            out["cam_f"] = np.tile([fx, fy], (B, 1)).astype(np.float32)
            out["cam_center"] = np.tile([cx, cy], (B, 1)).astype(np.float32)
        if self.cfg.use_depth and self.projection is not None:
            out["points3d"] = self._depth_clouds(T)
        return out

    def fitting_batch(self) -> Optional[Dict[str, np.ndarray]]:
        """Windowed PROXD/MoSh pseudo-GT SMPL fits aligned to the
        observation windows (reference prox_dataset.py:233-241 path
        construction + :313-317 gt_data merge): returns {trans (B, T, 3),
        betas (B, T, 10), pose_body (B, T, 63), root_orient (B, T, 3),
        valid (B, T) bool} or None when no fitting root is configured.
        Frames without a fit (or with non-finite fits) are zero dummies
        with valid=False — the reference's dummy-fill contract."""
        if self.fitting_root is None or not self.keyp_paths:
            return None
        rec_name = osp.basename(self.recording_dir.rstrip("/"))
        frame_names = ["_".join(osp.basename(p).split("_")[:-1])
                       for p in self.keyp_paths]
        paths = [osp.join(self.fitting_root, rec_name, "results", f,
                          "000.pkl") for f in frame_names]
        fits, valid = read_fitting_seq(paths, return_valid=True)
        valid = np.asarray(valid, bool)
        T = min(self.cfg.seq_len, max(self.num_frames, 1))
        B = len(self.intervals)
        out = {k: np.zeros((B, T) + v.shape[1:], np.float32)
               for k, v in fits.items()}
        out["valid"] = np.zeros((B, T), bool)
        for b, (s, e) in enumerate(self.intervals):
            for k, v in fits.items():
                out[k][b, : e - s] = v[s:e]
            out["valid"][b, : e - s] = valid[s:e]
        return out

    def _depth_clouds(self, T: int) -> np.ndarray:
        import cv2

        B = len(self.intervals)
        clouds = np.full((B, T, self.cfg.max_points, 3), np.inf,
                         np.float32)
        for b, (s, e) in enumerate(self.intervals):
            for t in range(e - s):
                name = "_".join(osp.basename(
                    self.keyp_paths[s + t]).split("_")[:-1])
                dpath = osp.join(self.recording_dir, "Depth",
                                 name + ".png")
                mpath = osp.join(self.recording_dir, "BodyIndex",
                                 name + ".png")
                if not (osp.exists(dpath) and osp.exists(mpath)):
                    continue
                depth = cv2.imread(dpath, cv2.IMREAD_UNCHANGED)
                depth = depth.astype(np.float64) / 8000.0
                mask = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
                mask = np.where(mask == 255, 1, 0).astype(np.uint8)
                clouds[b, t] = self.projection.masked_point_cloud(
                    depth, mask, self.cfg.max_points, seed=s + t)
        return clouds
