"""Fitting observation datasets: turn motion sequences into TTO
observations (3D joints / keypoint verts / point clouds) with optional
noise and synthetic occlusion.

Behavioral parity target: /root/reference/humor/datasets/
amass_fit_dataset.py (modalities :91-119, gaussian noise :121-124,
height-occlusion `make_partial` :126-142, `drop_middle` :144-148) over
the global-frame window view (amass_discrete_dataset only_global=True).

Note: the reference's `make_partial` references an unimported
`resize_points` (a latent bug, SURVEY.md §7); here occluded entries are
inf-masked in place, which the fitting losses already handle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.data.dataset import AmassDataset
from humor_tpu.data.windows import window_to_global

import jax.numpy as jnp


@dataclass
class FitObsConfig:
    seq_len: int = 60
    use_joints: bool = True
    use_verts: bool = False
    use_points: bool = False
    num_points: int = 1024       # sampled surface points per frame
    noise_std: float = 0.0
    make_partial: bool = False
    partial_height: float = 0.9  # occlude everything above this height
    drop_middle: bool = False


def _occlude_above(points: np.ndarray, height: float) -> np.ndarray:
    """inf-mask points with z above `height` (synthetic occlusion,
    reference :126-142)."""
    mask = points[..., 2:3] > height
    return np.where(mask, np.inf, points)


def _drop_middle(arr: np.ndarray) -> np.ndarray:
    """inf-mask the middle third of the sequence (reference :144-148)."""
    T = arr.shape[1]
    out = arr.copy()
    out[:, T // 3: 2 * T // 3] = np.inf
    return out


def build_observations(
    cfg: FitObsConfig,
    world_global: Dict[str, np.ndarray],   # components (B, T, D), frame-0
    rng: Optional[np.random.RandomState] = None,
    body_verts: Optional[np.ndarray] = None,  # (B, T, V, 3) optional mesh
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """-> (observed, gt). observed holds the selected noisy/occluded
    modalities; gt holds clean sequences for eval."""
    rng = rng or np.random.RandomState(0)
    B, T = world_global["trans"].shape[:2]
    joints = np.asarray(world_global["joints"]).reshape(B, T, -1, 3)
    gt = {
        "trans": np.asarray(world_global["trans"]),
        "root_orient": np.asarray(world_global["root_orient"]),
        "pose_body": np.asarray(world_global["pose_body"]),
        "joints3d": joints,
        "contacts": np.asarray(world_global.get("contacts")),
    }

    observed: Dict[str, np.ndarray] = {}
    if cfg.use_joints:
        observed["joints3d"] = joints.copy()
    if cfg.use_verts and "verts" in world_global:
        observed["verts3d"] = np.asarray(
            world_global["verts"]).reshape(B, T, -1, 3).copy()
    if cfg.use_points:
        if body_verts is None:
            raise ValueError("use_points requires body_verts")
        V = body_verts.shape[2]
        sel = rng.choice(V, size=min(cfg.num_points, V), replace=False)
        observed["points3d"] = np.asarray(body_verts)[:, :, sel].copy()

    for k, v in observed.items():
        if cfg.noise_std > 0:
            v = v + rng.randn(*v.shape).astype(v.dtype) * cfg.noise_std
        if cfg.make_partial:
            v = _occlude_above(v, cfg.partial_height)
        if cfg.drop_middle:
            v = _drop_middle(v)
        observed[k] = v.astype(np.float32)
    return observed, gt


def amass_fit_batches(dataset: AmassDataset, cfg: FitObsConfig,
                      batch_size: int, seed: int = 0):
    """Yield (observed, gt, meta) TTO batches over the dataset's sequences,
    windows canonicalized to their first frame (the reference's
    only_global view)."""
    import jax

    to_global = jax.jit(window_to_global)
    n_batches = max(1, dataset.num_seqs // batch_size)
    for i in range(n_batches):
        world_np, meta = dataset.sample_windows(
            seed + i, batch_size, cfg.seq_len)
        world = {k: jnp.asarray(v) for k, v in world_np.items()}
        g = to_global(world)
        g_np = {k: np.asarray(v) for k, v in g.items()}
        rng = np.random.RandomState(seed * 1000 + i)
        observed, gt = build_observations(cfg, g_np, rng)
        yield observed, gt, meta
