"""Windowed training-pair construction: world-frame motion -> per-step
canonicalized (input, output) pairs, plus the window-global view.

Behavioral parity target: /root/reference/humor/datasets/
amass_discrete_dataset.py:350-435,487-665 —
  * each step t is canonicalized into the heading-aligned frame of state t
    (rotation about z + xy shift to the origin);
  * trans2joint (root-joint xy offset) is computed ONCE from frame 0 of the
    window and reused for every step (:430-435), matching the rollout;
  * the "global" view canonicalizes every frame into frame 0's frame.

TPU-first: one pure function over typed state arrays with time as a batch
dim (the reference loops per step in numpy inside DataLoader workers).
Runs on host CPU or device; used by both the host data pipeline and tests.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from humor_tpu.models.canonical import FrameTransform, apply_world2local
from humor_tpu.ops import transforms


def window_trans2joint(world: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """(..., 3) trans2joint from frame 0: -[joints0_xy - trans0_xy, 0]."""
    root_joint_xy = world["joints"][..., 0, :2] - world["trans"][..., 0, :2]
    zeros1 = jnp.zeros_like(root_joint_xy[..., :1])
    return jnp.concatenate([-root_joint_xy, zeros1], axis=-1)


def step_frames(world: Dict[str, jnp.ndarray],
                trans2joint: jnp.ndarray) -> FrameTransform:
    """Heading-canonical frame of every step. world components (..., T, D);
    trans2joint (..., 3) broadcast to every step."""
    T = world["trans"].shape[-2]
    R = world["root_orient"].reshape(*world["root_orient"].shape[:-1], 3, 3)
    rot = transforms.compute_world2aligned_mat(R)
    zeros1 = jnp.zeros_like(world["trans"][..., :1])
    trans = jnp.concatenate([-world["trans"][..., :2], zeros1], axis=-1)
    t2j = jnp.broadcast_to(trans2joint[..., None, :], trans.shape)
    return FrameTransform(rot, trans, t2j)


def window_to_pairs(
    world: Dict[str, jnp.ndarray],
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray],
           Dict[str, jnp.ndarray]]:
    """Build training pairs from a world-frame window.

    world: typed state dict, components (..., T+1, D) with *matrix*
    rotations (leading dims arbitrary, e.g. a batch of windows).

    Returns (data_in, data_out, global_out):
      data_in[k]   (..., T, D)  state t in frame t
      data_out[k]  (..., T, D)  state t+1 in frame t
      global_out[k](..., T, D)  state t+1 in frame 0
    """
    t2j = window_trans2joint(world)
    frames = step_frames(world, t2j)

    in_frames = FrameTransform(frames.rot[..., :-1, :, :],
                               frames.trans[..., :-1, :],
                               frames.trans2joint[..., :-1, :])
    cur = {k: v[..., :-1, :] for k, v in world.items()}
    nxt = {k: v[..., 1:, :] for k, v in world.items()}

    data_in = apply_world2local(in_frames, cur)
    data_out = apply_world2local(in_frames, nxt)

    frame0 = FrameTransform(frames.rot[..., 0:1, :, :],
                            frames.trans[..., 0:1, :],
                            frames.trans2joint[..., 0:1, :])
    global_out = apply_world2local(frame0, nxt)
    return data_in, data_out, global_out


def window_to_pairs_multi(
    world: Dict[str, jnp.ndarray], steps_in: int,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Multi-step-history training pairs (model steps_in = S > 1;
    reference amass_discrete_dataset steps_in handling + humor_model.py
    :104-176 past-window parameterization).

    world: components (..., F, D), matrix rotations. Returns
      data_in[k]  (..., T, S, D)  frames i..i+S-1 in frame i+S-1
      data_out[k] (..., T, D)     frame  i+S      in frame i+S-1
    with T = F - S.
    """
    t2j = window_trans2joint(world)
    frames = step_frames(world, t2j)
    S, F = steps_in, world["trans"].shape[-2]
    T = F - S
    anchor = FrameTransform(frames.rot[..., S - 1: F - 1, :, :],
                            frames.trans[..., S - 1: F - 1, :],
                            frames.trans2joint[..., S - 1: F - 1, :])
    win = {k: jnp.stack([v[..., s: s + T, :] for s in range(S)], axis=-2)
           for k, v in world.items()}          # (..., T, S, D)
    nxt = {k: v[..., S:, :] for k, v in world.items()}
    anchor_w = FrameTransform(anchor.rot[..., :, None, :, :],
                              anchor.trans[..., :, None, :],
                              anchor.trans2joint[..., :, None, :])
    data_in = apply_world2local(anchor_w, win)
    data_out = apply_world2local(anchor, nxt)
    return data_in, data_out


def window_to_global(world: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """All T+1 frames canonicalized into frame 0 (the `only_global` /
    AMASSFitDataset view, reference amass_discrete_dataset.py:350-426)."""
    t2j = window_trans2joint(world)
    frames = step_frames(world, t2j)
    frame0 = FrameTransform(frames.rot[..., 0:1, :, :],
                            frames.trans[..., 0:1, :],
                            frames.trans2joint[..., 0:1, :])
    return apply_world2local(frame0, world)
