"""Rigid change-of-frame for typed motion states (heading canonicalization).

The HuMoR transition model operates on per-step *canonical* states: the
previous frame's body is moved so its root sits above the origin and its
heading (body-right projected to the ground) points along +x. This module
provides that transform and its inverse on typed state dicts.

Behavioral parity targets:
  /root/reference/humor/models/humor_model.py:696-772 (apply_world2local_trans)
  /root/reference/humor/models/humor_model.py:609-617, 960-994 (frame updates)

TPU-first design: states carry arbitrary leading batch dims and the
transform is a pure function usable inside `lax.scan`; component behavior
is dispatched on the static `Kind` tag, not runtime string matching.
"""

from __future__ import annotations

from typing import Dict, Mapping, NamedTuple, Optional

import jax
import jax.numpy as jnp

# geometry einsums must not drop to bf16 on TPU
_HI = jax.lax.Precision.HIGHEST

from humor_tpu.models import state as state_lib
from humor_tpu.models.state import Kind
from humor_tpu.ops import transforms


class FrameTransform(NamedTuple):
    """world->local rigid transform with the HuMoR composition conventions.

    rot:   (..., 3, 3)  heading-alignment rotation W
    trans: (..., 3)     pre-rotation translation (z component always 0)
    trans2joint: (..., 3)  xy offset from root translation to root joint
        (z always 0); points (joints/verts) are shifted by it before/after
        rotating so the rotation pivots about the root joint column.
    """

    rot: jnp.ndarray
    trans: jnp.ndarray
    trans2joint: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "FrameTransform":
        rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        z3 = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return FrameTransform(rot, z3, z3)


def _rotate_vecs(rot: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 3, 3) rotation to packed 3-vectors (..., J*3)."""
    batch_shape = flat.shape[:-1]
    pts = flat.reshape(*batch_shape, -1, 3)
    out = transforms.rotmat_apply(rot, pts)
    return out.reshape(*batch_shape, -1)


def apply_world2local(
    xform: FrameTransform,
    state: Mapping[str, jnp.ndarray],
    invert: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Transform every component of `state` into (or out of) the local frame.

    All rotation components must be in matrix form (packed, (..., N*9)).
    Forward (invert=False):
        rotations:  R' = W R
        trans:      t' = W (t + trans)
        points p:   p' = W (p + trans + t2j) - t2j
        vectors v:  v' = W v
    Inverse applies the exact reverse composition.
    """
    W = xform.rot
    Winv = jnp.swapaxes(W, -1, -2)
    out: Dict[str, jnp.ndarray] = {}
    for name, val in state.items():
        comp = state_lib.component(name) if name in state_lib._COMPONENTS else None
        if comp is None or comp.kind == Kind.LOCAL:
            out[name] = val
            continue
        if comp.kind == Kind.ROTATION:
            batch_shape = val.shape[:-1]
            R = val.reshape(*batch_shape, -1, 3, 3)
            M = Winv if invert else W
            Rp = transforms.rotmat_multiply(M[..., None, :, :], R)
            out[name] = Rp.reshape(*batch_shape, -1)
        elif comp.kind == Kind.POINT:
            if invert:
                out[name] = _rotate_vecs(Winv, val) - xform.trans
            else:
                out[name] = _rotate_vecs(W, val + xform.trans)
        elif comp.kind == Kind.OFFSET_POINT:
            batch_shape = val.shape[:-1]
            pts = val.reshape(*batch_shape, -1, 3)
            t2j = xform.trans2joint[..., None, :]
            if invert:
                shifted = pts + t2j
                rp = transforms.rotmat_apply(Winv, shifted)
                rp = rp - t2j - xform.trans[..., None, :]
            else:
                shifted = pts + xform.trans[..., None, :] + t2j
                rp = transforms.rotmat_apply(W, shifted)
                rp = rp - t2j
            out[name] = rp.reshape(*batch_shape, -1)
        elif comp.kind == Kind.VECTOR:
            out[name] = _rotate_vecs(Winv if invert else W, val)
        else:  # pragma: no cover
            raise ValueError(f"unhandled kind {comp.kind}")
    return out


def frame_from_state(
    state: Mapping[str, jnp.ndarray],
    trans2joint: Optional[jnp.ndarray] = None,
) -> FrameTransform:
    """Build the canonicalizing world->local transform from a world-frame
    state (matrix rotations). Mirrors the per-step frame computation at
    reference humor_model.py:960-963.

    - rot: heading alignment from root_orient
    - trans: [-x, -y, 0] of the root translation
    - trans2joint: if not given, computed as -[joint0_xy + trans_xy_offset, 0]
      from the state's joints (reference humor_model.py:829-832), assuming
      `state['joints']` is in the same world frame as trans.
    """
    batch_shape = state["trans"].shape[:-1]
    R = state["root_orient"].reshape(*batch_shape, 3, 3)
    rot = transforms.compute_world2aligned_mat(R)
    zeros1 = jnp.zeros((*batch_shape, 1), dtype=state["trans"].dtype)
    trans = jnp.concatenate([-state["trans"][..., :2], zeros1], axis=-1)
    if trans2joint is None:
        if "joints" in state:
            root_xy = state["joints"][..., :2] + trans[..., :2]
            trans2joint = jnp.concatenate([-root_xy, zeros1], axis=-1)
        else:
            trans2joint = jnp.zeros((*batch_shape, 3), dtype=state["trans"].dtype)
    return FrameTransform(rot, trans, trans2joint)
