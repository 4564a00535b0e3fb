"""Motion-state specification: which components make up the model state,
their dimensions per rotation representation, and packing to/from the flat
network input/output vectors.

Behavioral parity targets:
  /root/reference/humor/datasets/amass_utils.py:28-111 (DATA_NAMES,
      RETURN_CONFIGS, data_name_list, data_dim)
  /root/reference/humor/models/humor_model.py:30 (WORLD2ALIGN_NAME_CACHE —
      here expressed as a per-component `Kind`)

TPU-first design: a state is a plain dict[str, jnp.ndarray] pytree with
arbitrary leading batch dims; the spec is static Python metadata so every
pack/unpack/canonicalize call traces to pure gathers/concats under jit.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Dict, List, Mapping, Sequence, Tuple

import jax.numpy as jnp

from humor_tpu.body_model.constants import (
    NUM_BODY_JOINTS,
    NUM_CONTACTS,
    NUM_KEYPT_VERTS,
    NUM_SMPL_JOINTS,
)

ROT_REP_SIZE = {"aa": 3, "6d": 6, "mat": 9, "9d": 9}
IN_ROT_REPS = ("aa", "6d", "mat")
OUT_ROT_REPS = ("aa", "6d", "9d")


class Kind(enum.Enum):
    """How a component transforms under a world->local rigid change of frame
    (reference humor_model.py:696-772 branches by name; we branch by kind)."""

    POINT = "point"             # translate then rotate (trans)
    OFFSET_POINT = "offset_pt"  # translate about trans2joint then rotate (joints/verts)
    VECTOR = "vector"           # rotate only (velocities)
    ROTATION = "rotation"       # left-multiply (root_orient)
    LOCAL = "local"             # invariant (pose_body, contacts)


@dataclass(frozen=True)
class Component:
    name: str
    kind: Kind
    # number of "atoms": rotations for rotation-kinds, 3-vectors for
    # point/vector kinds, scalars for LOCAL non-rotations
    count: int
    is_rotation: bool = False
    is_scalar: bool = False

    def dim(self, rot_rep_size: int = 9) -> int:
        if self.is_rotation:
            return self.count * rot_rep_size
        if self.is_scalar:
            return self.count
        return self.count * 3


_COMPONENTS = {
    "trans": Component("trans", Kind.POINT, 1),
    "trans_vel": Component("trans_vel", Kind.VECTOR, 1),
    "root_orient": Component("root_orient", Kind.ROTATION, 1, is_rotation=True),
    "root_orient_vel": Component("root_orient_vel", Kind.VECTOR, 1),
    "pose_body": Component("pose_body", Kind.LOCAL, NUM_BODY_JOINTS, is_rotation=True),
    "pose_body_vel": Component("pose_body_vel", Kind.LOCAL, NUM_BODY_JOINTS),
    "joints": Component("joints", Kind.OFFSET_POINT, NUM_SMPL_JOINTS),
    "joints_vel": Component("joints_vel", Kind.VECTOR, NUM_SMPL_JOINTS),
    "joints_orient_vel": Component("joints_orient_vel", Kind.LOCAL, 1, is_scalar=True),
    "verts": Component("verts", Kind.OFFSET_POINT, NUM_KEYPT_VERTS),
    "verts_vel": Component("verts_vel", Kind.VECTOR, NUM_KEYPT_VERTS),
    "contacts": Component("contacts", Kind.LOCAL, NUM_CONTACTS, is_scalar=True),
}

# canonical ordering of components in packed vectors (reference DATA_NAMES)
DATA_NAMES = [
    "trans", "trans_vel", "root_orient", "root_orient_vel", "pose_body",
    "pose_body_vel", "joints", "joints_vel", "joints_orient_vel", "verts",
    "verts_vel", "contacts",
]

# named state configurations (reference RETURN_CONFIGS)
RETURN_CONFIGS: Dict[str, Tuple[str, ...]] = {
    "smpl+joints": (
        "trans", "trans_vel", "root_orient", "root_orient_vel", "pose_body",
        "joints", "joints_vel",
    ),
    "smpl+joints+contacts": (
        "trans", "trans_vel", "root_orient", "root_orient_vel", "pose_body",
        "joints", "joints_vel", "contacts",
    ),
    "all": (
        "trans", "trans_vel", "root_orient", "root_orient_vel", "pose_body",
        "joints", "joints_vel", "verts", "contacts",
    ),
}


def component(name: str) -> Component:
    return _COMPONENTS[name]


def data_name_list(return_config: str) -> List[str]:
    """Ordered component names for a named state configuration."""
    return list(RETURN_CONFIGS[return_config])


def data_dim(name: str, rot_rep_size: int = 9) -> int:
    return _COMPONENTS[name].dim(rot_rep_size)


@dataclass(frozen=True)
class StateSpec:
    """Static description of a packed state vector: ordered (name, dim) pairs.

    `names` excludes auxiliary outputs (contacts) when the spec describes the
    network *input* — mirroring HumorModel.__init__ which strips 'contacts'
    from the input names (reference humor_model.py:151-154).
    """

    names: Tuple[str, ...]
    rot_rep: str  # one of ROT_REP_SIZE keys

    @property
    def rot_size(self) -> int:
        return ROT_REP_SIZE[self.rot_rep]

    @property
    def dims(self) -> Tuple[int, ...]:
        return tuple(data_dim(n, self.rot_size) for n in self.names)

    @property
    def total_dim(self) -> int:
        return sum(self.dims)

    @property
    def offsets(self) -> Tuple[Tuple[str, int, int], ...]:
        out, s = [], 0
        for n, d in zip(self.names, self.dims):
            out.append((n, s, s + d))
            s += d
        return tuple(out)

    def pack(self, state: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        """dict of (..., D_i) arrays -> (..., total_dim)."""
        return jnp.concatenate([state[n] for n in self.names], axis=-1)

    def unpack(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """(..., total_dim) -> dict of (..., D_i) arrays."""
        out = {}
        for n, s, e in self.offsets:
            out[n] = x[..., s:e]
        return out


def make_specs(model_data_config: str, in_rot_rep: str, out_rot_rep: str
               ) -> Tuple[StateSpec, StateSpec, StateSpec, bool]:
    """Build (input_spec, decoder_out_spec, state_spec_mat, pred_contacts).

    - input_spec: network input layout (no contacts), in_rot_rep rotations.
    - decoder_out_spec: raw decoder output layout (+contacts if configured),
      out_rot_rep rotations.
    - state_spec_mat: full predicted-state layout with matrix rotations
      (+contacts), i.e. what `split_output` produces after delta composition.
    """
    names = data_name_list(model_data_config)
    pred_contacts = "contacts" in names
    in_names = tuple(n for n in names if n != "contacts")
    out_names = in_names + (("contacts",) if pred_contacts else ())
    return (
        StateSpec(in_names, in_rot_rep),
        StateSpec(out_names, out_rot_rep),
        StateSpec(out_names, "mat"),
        pred_contacts,
    )
