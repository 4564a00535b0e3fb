"""Fit-result visualization over RGB frames: project the fitted skeleton
with the camera intrinsics and overlay on video frames (or a blank
canvas when frames are unavailable).

Behavioral parity target: /root/reference/humor/fitting/viz_fitting_rgb.py
(render fitted body over frames with the intrinsics camera :49-160;
pyrender mesh rendering is replaced by matplotlib overlays + OBJ export
since pyrender is not available here).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.viz.utils import SMPL_BONES, create_video


def project_to_image(points3d: np.ndarray, cam_f: Sequence[float],
                     cam_center: Sequence[float]) -> np.ndarray:
    """(..., 3) camera-frame points -> (..., 2) pixels (pinhole)."""
    z = np.maximum(np.abs(points3d[..., 2:3]), 1e-9) \
        * np.sign(points3d[..., 2:3] + 1e-12)
    uv = points3d[..., :2] / z
    return uv * np.asarray(cam_f) + np.asarray(cam_center)


def overlay_skeleton_frames(
    joints3d: np.ndarray,          # (T, J, 3) camera frame
    cam_f: Sequence[float],
    cam_center: Sequence[float],
    out_dir: str,
    img_paths: Optional[Sequence[str]] = None,
    img_size: tuple = (1920, 1080),
    joints2d_obs: Optional[np.ndarray] = None,  # (T, 25, 3) observations
    make_video: bool = True,
) -> List[str]:
    """Render per-frame overlays of the fitted skeleton (and observed 2D
    keypoints) on the video frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    uv = project_to_image(joints3d, cam_f, cam_center)  # (T, J, 2)
    paths = []
    for t in range(joints3d.shape[0]):
        fig, ax = plt.subplots(figsize=(8, 4.5))
        if img_paths is not None and t < len(img_paths) \
                and os.path.exists(img_paths[t]):
            from PIL import Image

            im = np.asarray(Image.open(img_paths[t]))
            ax.imshow(im)
            w, h = im.shape[1], im.shape[0]
        else:
            w, h = img_size
            ax.set_facecolor("black")
        for p, c in SMPL_BONES:
            ax.plot([uv[t, p, 0], uv[t, c, 0]],
                    [uv[t, p, 1], uv[t, c, 1]], c="#2ca02c", lw=2)
        ax.scatter(uv[t, :, 0], uv[t, :, 1], c="#2ca02c", s=8)
        if joints2d_obs is not None:
            conf = joints2d_obs[t, :, 2]
            vis = conf > 0
            ax.scatter(joints2d_obs[t, vis, 0], joints2d_obs[t, vis, 1],
                       c="#d62728", s=10, marker="x")
        ax.set_xlim(0, w)
        ax.set_ylim(h, 0)
        ax.set_axis_off()
        path = os.path.join(out_dir, f"overlay_{t:06d}.png")
        fig.savefig(path, dpi=80, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    if make_video:
        create_video(out_dir, os.path.join(out_dir, "overlay.mp4"),
                     pattern="overlay_%06d.png")
    return paths


def viz_stitched_result(stitched_npz: str, out_dir: str,
                        body=None, cam_f=(1060.5, 1060.4),
                        cam_center=(960.0, 540.0),
                        max_frames: int = 120,
                        img_paths: Optional[Sequence[str]] = None,
                        mesh: bool = True) -> List[str]:
    """Load a stitched fitting result and render it over the video frames.

    With a body model the fitted MESH is rasterized (shaded, floor
    checkerboard, contacts colored — reference viz_fitting_rgb.py:49-160)
    in addition to skeleton overlays; without one, the stored rollout
    joints give skeleton overlays only."""
    import jax.numpy as jnp

    data = dict(np.load(stitched_npz))
    T = min(data["trans"].shape[0], max_frames)
    paths: List[str] = []
    if body is not None:
        from humor_tpu.fitting.optimizer import smpl_results

        pred = smpl_results(
            body, jnp.asarray(data["trans"][None, :T]),
            jnp.asarray(data["root_orient"][None, :T]),
            jnp.asarray(data["pose_body"][None, :T]),
            jnp.asarray(data["betas"][None]))
        joints = np.asarray(pred["joints3d"][0])
        if mesh and body.faces is not None and "points3d" in pred:
            from humor_tpu.viz.raster import render_mesh_over_frames

            verts = np.asarray(pred["points3d"][0])  # (T, V, 3)
            contact_verts = None
            if "contacts" in data:
                # per-joint contacts -> the verts each joint dominates
                w = np.asarray(body.lbs_weights)       # (V, J)
                cj = np.asarray(data["contacts"][:T])  # (T, J)
                nj = min(cj.shape[1], w.shape[1])
                contact_verts = (cj[:, :nj] @ w[:, :nj].T) > 0.5
            floor = data.get("floor_plane")
            if floor is not None:
                floor = np.asarray(floor).reshape(-1, 4)[0]
            paths += render_mesh_over_frames(
                verts, np.asarray(body.faces.arr), cam_f, cam_center,
                os.path.join(out_dir, "mesh"), img_paths=img_paths,
                floor_plane=floor,
                contact_verts=contact_verts)
    elif "joints3d_rollout" in data:
        joints = np.asarray(data["joints3d_rollout"][:T])
    else:
        raise ValueError("need a body model or stored rollout joints")
    paths += overlay_skeleton_frames(joints, cam_f, cam_center, out_dir,
                                     img_paths=img_paths)
    return paths
