"""SMPL-family body model with a native JAX linear-blend-skinning forward.

Replaces the reference's dependency on the `smplx` package
(/root/reference/humor/body_model/body_model.py:11-115) with a first-class
implementation: the body model sits inside every training loss and every
TTO closure, so it must be a pure jit-able function.

The LBS math is the public SMPL formulation (Loper et al. 2015):
    v_shaped = v_template + shapedirs . betas
    J_rest   = J_regressor @ v_shaped
    v_posed  = v_shaped + posedirs . vec(R_{1:} - I)
    A_j      = A_parent(j) . [R_j | J_j - J_parent(j)]
    v_world  = sum_j w_vj A'_j v_posed + trans

TPU-first notes:
  * all heavy ops are dense einsums -> MXU; the kinematic chain is a
    statically unrolled loop of tiny batched 4x4 composes (J <= 52);
  * genders are handled by running per-gender parameter banks and
    where-selecting per sample (humor_tpu.body_model.gendered), replacing
    the reference's gender-split + zero-pad dance (humor_loss.py:261-298);
  * model data is a NamedTuple pytree -> can be donated/sharded/closured
    into jit like any other array bundle.

Loader parity: AMASS-style `model.npz` files, 16-beta shapedirs padding
(reference body_model.py:37-48), optional OpenPose vertex-joint selector
(body_model.py:32-35,108-110).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.body_model import constants as C
from humor_tpu.ops import transforms

# LBS einsums must stay f32 on TPU (bf16 default loses ~1e-3 of geometry)
_HI = jax.lax.Precision.HIGHEST


class StaticArray:
    """Hashable numpy-array wrapper for static pytree metadata (kinematic
    tree, face indices) — lets SmplModel pass through jit boundaries with
    the skeleton structure treated as compile-time constant."""

    __slots__ = ("arr", "_hash")

    def __init__(self, arr):
        self.arr = np.asarray(arr)
        self.arr.setflags(write=False)
        self._hash = hash((self.arr.shape, self.arr.dtype.str,
                           self.arr.tobytes()))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (isinstance(other, StaticArray)
                and self._hash == other._hash
                and np.array_equal(self.arr, other.arr))

    def __array__(self, dtype=None, copy=None):
        return self.arr if dtype is None else self.arr.astype(dtype)

    def __getitem__(self, idx):
        return self.arr[idx]

    @property
    def size(self):
        return self.arr.size

    @property
    def shape(self):
        return self.arr.shape


from dataclasses import dataclass, field  # noqa: E402


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SmplModel:
    """Parameter bundle for one SMPL-family body. Array fields are pytree
    leaves (shardable/donatable); skeleton structure is static metadata."""

    v_template: jnp.ndarray    # (V, 3)
    shapedirs: jnp.ndarray     # (V, 3, n_betas)
    posedirs: jnp.ndarray      # (9*(J-1), V*3)
    j_regressor: jnp.ndarray   # (J, V)
    lbs_weights: jnp.ndarray   # (V, J)
    parents: StaticArray = field(metadata=dict(static=True), default=None)
    faces: StaticArray = field(metadata=dict(static=True), default=None)
    vtx_joint_ids: StaticArray = field(metadata=dict(static=True),
                                       default=None)

    @property
    def num_joints(self) -> int:
        return int(self.j_regressor.shape[0])

    @property
    def num_verts(self) -> int:
        return int(self.v_template.shape[0])

    @property
    def num_betas(self) -> int:
        return int(self.shapedirs.shape[-1])


class SmplOutput(NamedTuple):
    v: jnp.ndarray    # (B, V, 3) posed vertices (world frame)
    Jtr: jnp.ndarray  # (B, J[+K], 3) posed joints (+ vertex joints)


# SMPL+H OpenPose-correspondence vertex ids (public smplx vertex_ids table),
# appended as extra joints when use_vtx_selector=True.
SMPLH_VERTEX_IDS = {
    "nose": 332, "reye": 6260, "leye": 2800, "rear": 4071, "lear": 583,
    "rthumb": 6191, "rindex": 5782, "rmiddle": 5905, "rring": 6016,
    "rpinky": 6133, "lthumb": 2746, "lindex": 2319, "lmiddle": 2445,
    "lring": 2556, "lpinky": 2673, "LBigToe": 3216, "LSmallToe": 3226,
    "LHeel": 3387, "RBigToe": 6617, "RSmallToe": 6624, "RHeel": 6787,
}
_VTX_ORDER = ["nose", "reye", "leye", "rear", "lear", "LBigToe", "LSmallToe",
              "LHeel", "RBigToe", "RSmallToe", "RHeel"]


def load_smpl_npz(path: str, num_betas: int = C.BETA_SIZE,
                  use_vtx_selector: bool = False,
                  dtype=jnp.float32) -> SmplModel:
    """Load an AMASS-style SMPL/SMPL+H `model.npz`.

    Pads shapedirs with zeros when the file carries fewer shape directions
    than `num_betas` (reference body_model.py:37-48 pads to 16).
    """
    raw = np.load(path, encoding="latin1", allow_pickle=True)
    v_template = np.asarray(raw["v_template"], dtype=np.float32)
    shapedirs = np.asarray(raw["shapedirs"], dtype=np.float32)
    if shapedirs.shape[-1] < num_betas:
        pad = num_betas - shapedirs.shape[-1]
        shapedirs = np.concatenate(
            [shapedirs, np.zeros((*shapedirs.shape[:-1], pad), np.float32)],
            axis=-1)
    shapedirs = shapedirs[..., :num_betas]
    posedirs = np.asarray(raw["posedirs"], dtype=np.float32)
    V = v_template.shape[0]
    posedirs = posedirs.reshape(V * 3, -1).T  # (P, V*3)
    j_regressor = np.asarray(raw["J_regressor"], dtype=np.float32)
    if j_regressor.ndim != 2:  # some files store sparse
        j_regressor = np.asarray(j_regressor.item().todense(), np.float32)
    weights = np.asarray(raw["weights"], dtype=np.float32)
    parents = np.asarray(raw["kintree_table"], dtype=np.int64)[0]
    parents[0] = -1
    faces = np.asarray(raw["f"], dtype=np.int32)
    vtx_ids = (np.asarray([SMPLH_VERTEX_IDS[k] for k in _VTX_ORDER],
                          np.int32)
               if use_vtx_selector else np.zeros((0,), np.int32))
    return SmplModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(weights, dtype),
        parents=StaticArray(parents.astype(np.int32)),
        faces=StaticArray(faces),
        vtx_joint_ids=StaticArray(vtx_ids),
    )


def synthetic_smpl_model(key: Optional[jax.Array] = None,
                         num_verts: int = 256,
                         num_joints: int = 22,
                         num_betas: int = C.BETA_SIZE,
                         dtype=jnp.float32) -> SmplModel:
    """Procedural mini body model for tests/benchmarks — the licensed SMPL
    assets cannot ship (SURVEY.md §7 'Licensed assets'). Produces a
    well-conditioned model: plausible skeleton from the SMPL parent tree,
    vertices scattered around bones, smooth skinning weights.
    """
    if key is None:
        key = jax.random.PRNGKey(1234)
    rng = np.random.RandomState(np.asarray(jax.random.key_data(key))[-1] % (2**31))

    parents = np.asarray(C.SMPL_PARENTS[:num_joints], np.int32).copy()
    # rest joints: start at pelvis ~(0,0,0.9), children offset downward/outward
    rest_j = np.zeros((num_joints, 3), np.float32)
    rest_j[0] = [0.0, 0.0, 0.9]
    for j in range(1, num_joints):
        off = rng.randn(3).astype(np.float32) * 0.12
        rest_j[j] = rest_j[parents[j]] + off

    # vertices around the bones
    host = rng.randint(0, num_joints, size=num_verts)
    v_template = rest_j[host] + rng.randn(num_verts, 3).astype(np.float32) * 0.08

    # regressor: each joint regresses from nearby verts (softmax of -dist)
    d = np.linalg.norm(v_template[None, :, :] - rest_j[:, None, :], axis=-1)
    j_reg = np.exp(-d / 0.05)
    j_reg /= j_reg.sum(axis=1, keepdims=True)
    # exact rest-pose consistency: J_regressor @ v_template == rest_j
    # (not strictly needed; keep approximate like real SMPL)

    w = np.exp(-d.T / 0.08)  # (V, J)
    w /= w.sum(axis=1, keepdims=True)

    shapedirs = rng.randn(num_verts, 3, num_betas).astype(np.float32) * 0.01
    posedirs = rng.randn(9 * (num_joints - 1),
                         num_verts * 3).astype(np.float32) * 0.001

    # arbitrary triangulation over vertex indices
    faces = rng.randint(0, num_verts, size=(2 * num_verts, 3)).astype(np.int32)

    return SmplModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_reg, dtype),
        lbs_weights=jnp.asarray(w, dtype),
        parents=StaticArray(parents),
        faces=StaticArray(faces),
        vtx_joint_ids=StaticArray(np.zeros((0,), np.int32)),
    )


def _rigid_transform_chain(rot_mats: jnp.ndarray, rest_joints: jnp.ndarray,
                           parents: np.ndarray):
    """Compose per-joint world transforms down the kinematic tree.

    rot_mats: (B, J, 3, 3); rest_joints: (B, J, 3).
    Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)).
    Statically unrolled over J (<= 52): each step is a batched 3x3 matmul.
    """
    B, J = rot_mats.shape[:2]
    rel = rest_joints.at[:, 1:].add(-rest_joints[:, np.asarray(parents[1:])])

    world_rots = [rot_mats[:, 0]]
    world_pos = [rest_joints[:, 0]]
    for j in range(1, J):
        p = int(parents[j])
        wr = jnp.matmul(world_rots[p], rot_mats[:, j], precision=_HI)
        wp = jnp.einsum("bij,bj->bi", world_rots[p], rel[:, j], precision=_HI) + world_pos[p]
        world_rots.append(wr)
        world_pos.append(wp)
    Rw = jnp.stack(world_rots, axis=1)   # (B, J, 3, 3)
    tw = jnp.stack(world_pos, axis=1)    # (B, J, 3)

    # relative-to-rest transforms for skinning: translation part becomes
    # t - R @ rest_joint
    t_rel = tw - jnp.einsum("bjik,bjk->bji", Rw, rest_joints, precision=_HI)
    return tw, Rw, t_rel


def lbs(model: SmplModel,
        betas: jnp.ndarray,        # (B, n_betas)
        rot_mats: jnp.ndarray,     # (B, J, 3, 3) full per-joint rotations
        trans: jnp.ndarray,        # (B, 3)
        vert_ids: Optional[np.ndarray] = None,
        compute_dtype=None,
        ) -> SmplOutput:
    """Core skinning forward from per-joint rotation matrices.

    vert_ids: static vertex selection — skin ONLY these vertices. The
    joint path (rest-joint regression + kinematic chain) always runs on
    the full shaped template, so joints are exact; the expensive per-
    vertex blend (pose blendshapes + skinning, the TTO hot path at
    V=6890) shrinks to |vert_ids|. Extra vertex joints (vtx_joint_ids)
    are appended to `vert_ids` automatically so Jtr keeps its layout.

    compute_dtype: when jnp.bfloat16, the PER-VERTEX pipeline (pose
    blendshapes + skinning blends — the FLOPs/bandwidth bulk at V=6890)
    runs in bf16 with f32 outputs; the shape blendshapes, rest-joint
    regression, and kinematic chain stay f32 so JOINTS are exact. Meant
    for training-LOSS bodies (vertex error ~1e-3 m, harmless in a loss
    gradient — see tests/test_body_model.py bf16 bound); geometry/TTO
    paths must keep the f32 default (module-header war story).
    """
    # shape blendshapes (always full: rest joints regress from all verts)
    v_shaped = model.v_template + jnp.einsum(
        "bl,vcl->bvc", betas, model.shapedirs, precision=_HI)
    rest_joints = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped, precision=_HI)

    B = betas.shape[0]
    n_extra = int(model.vtx_joint_ids.size)
    if vert_ids is not None:
        sel = np.concatenate([np.asarray(vert_ids, np.int64).reshape(-1),
                              np.asarray(model.vtx_joint_ids,
                                         np.int64).reshape(-1)])
        sel = sel.astype(np.int32)
        v_shaped_s = v_shaped[:, sel]
        weights_s = model.lbs_weights[sel]
        P = model.posedirs.shape[0]
        V = model.v_template.shape[0]
        posedirs_s = model.posedirs.reshape(P, V, 3)[:, sel].reshape(P, -1)
        extra_slice = slice(len(sel) - n_extra, len(sel))
    else:
        v_shaped_s = v_shaped
        weights_s = model.lbs_weights
        posedirs_s = model.posedirs
        extra_slice = None

    # pose blendshapes from non-root rotations
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feat = (rot_mats[:, 1:] - eye).reshape(B, -1)  # (B, 9*(J-1))

    posed_joints, Rw, t_rel = _rigid_transform_chain(
        rot_mats, rest_joints, model.parents)

    if compute_dtype is not None:
        cd = compute_dtype
        pose_feat, posedirs_s, v_shaped_s = (
            pose_feat.astype(cd), posedirs_s.astype(cd),
            v_shaped_s.astype(cd))
        weights_b, Rw_b, t_rel_b = (weights_s.astype(cd), Rw.astype(cd),
                                    t_rel.astype(cd))
        prec = None
    else:
        weights_b, Rw_b, t_rel_b = weights_s, Rw, t_rel
        prec = _HI

    v_posed = v_shaped_s + jnp.matmul(
        pose_feat, posedirs_s, precision=prec).reshape(B, -1, 3)

    # skinning: per-vertex blended rotation+translation
    R_v = jnp.einsum("vj,bjik->bvik", weights_b, Rw_b, precision=prec)
    t_v = jnp.einsum("vj,bji->bvi", weights_b, t_rel_b, precision=prec)
    v_out = jnp.einsum("bvik,bvk->bvi", R_v, v_posed, precision=prec) + t_v
    if compute_dtype is not None:
        v_out = v_out.astype(betas.dtype)

    v_out = v_out + trans[:, None, :]
    joints_out = posed_joints + trans[:, None, :]

    if n_extra > 0:
        if extra_slice is not None:
            extra = v_out[:, extra_slice]
            v_out = v_out[:, : extra_slice.start]
        else:
            extra = v_out[:, np.asarray(model.vtx_joint_ids)]
        joints_out = jnp.concatenate([joints_out, extra], axis=1)
    elif extra_slice is not None:
        v_out = v_out  # no extras appended; selection is exactly vert_ids
    return SmplOutput(v=v_out, Jtr=joints_out)


def rest_root_joint(model: SmplModel, betas: jnp.ndarray) -> jnp.ndarray:
    """Shaped rest-pose ROOT joint j0 (B, 3) — a function of betas only.

    SMPL composes the global orientation about j0 and adds `trans`
    afterwards, so rigid maps of the posed body reduce to parameter
    arithmetic through this point (geometry.rigid_transform_smpl_params
    and the TTO's camera<->prior frame change both hinge on it)."""
    v_shaped = model.v_template + jnp.einsum(
        "bl,vcl->bvc", betas, model.shapedirs, precision=_HI)
    return jnp.einsum("v,bvc->bc", model.j_regressor[0], v_shaped,
                      precision=_HI)


def forward(model: SmplModel,
            root_orient: jnp.ndarray,            # (B, 3) aa or (B, 3, 3)
            pose_body: jnp.ndarray,              # (B, (Jb)*3) aa or (B, Jb, 3, 3)
            betas: jnp.ndarray,                  # (B, n_betas)
            trans: jnp.ndarray,                  # (B, 3)
            pose_hand: Optional[jnp.ndarray] = None,  # (B, 30*3) aa
            vert_ids: Optional[np.ndarray] = None,
            compute_dtype=None,
            ) -> SmplOutput:
    """User-facing forward matching the reference BodyModel call signature
    (body_model.py:72-115): body joints only by default, hands flat when
    pose_hand is None (flat_hand_mean=True semantics).
    compute_dtype: see `lbs` (bf16 per-vertex pipeline for loss bodies)."""
    B = betas.shape[0]
    J = model.num_joints
    n_body = min(C.NUM_BODY_JOINTS, J - 1)

    if root_orient.ndim == 2:
        root_mat = transforms.aa_to_rotmat(root_orient)[:, None]  # (B,1,3,3)
    else:
        root_mat = root_orient.reshape(B, 1, 3, 3)
    if pose_body.ndim == 2:
        body_mat = transforms.aa_to_rotmat(
            pose_body.reshape(B, n_body, 3))
    else:
        body_mat = pose_body.reshape(B, n_body, 3, 3)

    mats = [root_mat, body_mat]
    n_rest = J - 1 - n_body
    if n_rest > 0:
        if pose_hand is not None:
            hand_mat = transforms.aa_to_rotmat(
                pose_hand.reshape(B, n_rest, 3))
        else:
            hand_mat = jnp.broadcast_to(
                jnp.eye(3, dtype=betas.dtype), (B, n_rest, 3, 3))
        mats.append(hand_mat)
    rot_mats = jnp.concatenate(mats, axis=1)
    return lbs(model, betas, rot_mats, trans, vert_ids=vert_ids,
               compute_dtype=compute_dtype)


def find_model_path(base: str, gender: str) -> str:
    return os.path.join(base, gender, "model.npz")
