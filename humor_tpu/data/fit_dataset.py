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


def sample_surface_points(verts: np.ndarray, faces: np.ndarray,
                          num_points: int,
                          rng: np.random.RandomState) -> np.ndarray:
    """Uniform-on-the-surface mesh sampling: area-weighted face choice +
    uniform barycentric coordinates (the numpy equivalent of the
    reference's per-frame `trimesh.sample.sample_surface`, reference
    amass_fit_dataset.py:97-119 — trimesh is not in this image).

    verts (..., V, 3), faces (F, 3) int -> (..., num_points, 3).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    lead = verts.shape[:-2]
    v = verts.reshape((-1,) + verts.shape[-2:])        # (N, V, 3)
    N = v.shape[0]
    tri = v[:, faces]                                   # (N, F, 3, 3)
    e1 = tri[:, :, 1] - tri[:, :, 0]
    e2 = tri[:, :, 2] - tri[:, :, 0]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)  # (N, F)
    cdf = np.cumsum(areas, axis=-1)
    out = np.empty((N, num_points, 3), np.float64)
    # sqrt-reparameterized barycentric coords are uniform on the triangle
    r1 = np.sqrt(rng.rand(N, num_points))
    r2 = rng.rand(N, num_points)
    w0, w1, w2 = 1.0 - r1, r1 * (1.0 - r2), r1 * r2
    u = rng.rand(N, num_points)
    for n in range(N):  # per-frame inverse-CDF face lookup (N <= B*T)
        fidx = np.searchsorted(cdf[n], u[n] * cdf[n, -1], side="right")
        fidx = np.minimum(fidx, faces.shape[0] - 1)
        t = tri[n, fidx]                                # (P, 3, 3)
        out[n] = (w0[n, :, None] * t[:, 0] + w1[n, :, None] * t[:, 1]
                  + w2[n, :, None] * t[:, 2])
    return out.reshape(lead + (num_points, 3)).astype(np.float32)


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
    body_faces: Optional[np.ndarray] = None,  # (F, 3) mesh topology
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
        if body_faces is not None:
            observed["points3d"] = sample_surface_points(
                np.asarray(body_verts), body_faces, cfg.num_points, rng)
        else:
            # topology unknown: vertex subsample (coarser than the
            # reference's surface sampling; callers should pass faces)
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
                      batch_size: int, seed: int = 0, body=None):
    """Yield (observed, gt, meta) TTO batches over the dataset's sequences,
    windows canonicalized to their first frame (the reference's
    only_global view).

    `body` (an SmplModel) is required when cfg.use_points: the GT mesh is
    re-posed with an SMPL forward and its surface sampled (reference
    amass_fit_dataset.py:97-119 runs the body model per window for the
    points3d modality)."""
    import jax

    from humor_tpu.ops import transforms as _tf

    to_global = jax.jit(window_to_global)
    n_batches = max(1, dataset.num_seqs // batch_size)
    for i in range(n_batches):
        world_np, meta = dataset.sample_windows(
            seed + i, batch_size, cfg.seq_len)
        world = {k: jnp.asarray(v) for k, v in world_np.items()}
        g = to_global(world)
        g_np = {k: np.asarray(v) for k, v in g.items()}
        rng = np.random.RandomState(seed * 1000 + i)
        body_verts = body_faces = None
        if cfg.use_points:
            if body is None:
                raise ValueError("use_points requires a body model")
            from humor_tpu.body_model import smpl as _smpl

            B, T = g_np["trans"].shape[:2]
            root = jnp.asarray(g_np["root_orient"])
            pose = jnp.asarray(g_np["pose_body"])
            if root.shape[-1] == 9:  # windows view carries matrices
                root = _tf.rotmat_to_aa(root.reshape(B, T, 3, 3))
                pose = _tf.rotmat_to_aa(
                    pose.reshape(B, T, -1, 3, 3)).reshape(B, T, -1)
            betas = jnp.asarray(meta["betas"], jnp.float32) \
                if isinstance(meta, dict) and "betas" in meta \
                else jnp.zeros((B, body.num_betas), jnp.float32)
            out = _smpl.forward(
                body, np.asarray(root).reshape(B * T, 3),
                np.asarray(pose).reshape(B * T, -1),
                jnp.repeat(betas, T, axis=0),
                np.asarray(g_np["trans"]).reshape(B * T, 3))
            body_verts = np.asarray(out.v).reshape(B, T, -1, 3)
            body_faces = np.asarray(body.faces.arr)
        observed, gt = build_observations(cfg, g_np, rng,
                                          body_verts=body_verts,
                                          body_faces=body_faces)
        yield observed, gt, meta
