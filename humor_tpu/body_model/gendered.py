"""Mixed-gender batched SMPL forward.

The reference splits each batch by gender, zero-pads each split to a fixed
SMPL batch size, runs the per-gender torch body models sequentially, and
re-orders the concatenated result (humor_loss.py:261-298,
humor_model.py:546-582). On TPU that dance costs dynamic shapes and
gathers; instead we evaluate each gender's parameter bank over the full
batch and where-select per sample — same total FLOPs as the reference's
padded scheme, fully static shapes, trivially differentiable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from humor_tpu.body_model.smpl import SmplModel, SmplOutput, forward

GENDER_IDS = {"male": 0, "female": 1, "neutral": 2}


def gender_ids_from_names(names: Sequence[str]) -> np.ndarray:
    return np.asarray([GENDER_IDS[n] for n in names], np.int32)


def make_rollout_joint_fn(models: Dict[str, SmplModel],
                          gender_ids: jnp.ndarray,  # (B,)
                          betas: jnp.ndarray,       # (B, n_betas)
                          order: Tuple[str, ...] = ("male", "female")):
    """Build the HuMoR-Qual joint-feedback callback for
    humor_tpu.models.humor.rollout: runs the gendered SMPL forward on the
    step's predicted params and returns flat (B, 22*3) joints."""
    from humor_tpu.body_model import constants as C
    from humor_tpu.ops import transforms

    def joint_fn(trans, root_orient_mat, pose_body_mat):
        B = trans.shape[0]
        root_aa = transforms.rotmat_to_aa(
            root_orient_mat.reshape(B, 3, 3))
        pose_aa = transforms.rotmat_to_aa(
            pose_body_mat.reshape(B, -1, 3, 3)).reshape(B, -1)
        out = gendered_forward(models, gender_ids, root_aa, pose_aa,
                               betas, trans, order=order)
        return out.Jtr[:, :C.NUM_SMPL_JOINTS].reshape(B, -1)

    return joint_fn


def gendered_forward(
    models: Dict[str, SmplModel],
    gender_ids: jnp.ndarray,  # (B,) int32 — values must index into `order`
    root_orient: jnp.ndarray,
    pose_body: jnp.ndarray,
    betas: jnp.ndarray,
    trans: jnp.ndarray,
    pose_hand: Optional[jnp.ndarray] = None,
    order: Tuple[str, ...] = ("male", "female"),
    compute_dtype=None,
) -> SmplOutput:
    """Run SMPL for a batch with per-sample gender.

    `models` maps gender name -> SmplModel. Only genders in `order` are
    evaluated (training uses male/female; neutral appears in fitting).
    compute_dtype: see smpl.lbs (bf16 per-vertex pipeline for loss
    bodies; joints stay exact f32)."""
    v = None
    j = None
    for gid, name in enumerate(order):
        out = forward(models[name], root_orient, pose_body, betas, trans,
                      pose_hand, compute_dtype=compute_dtype)
        sel = (gender_ids == gid)[:, None, None]
        v = out.v if v is None else jnp.where(sel, out.v, v)
        j = out.Jtr if j is None else jnp.where(sel, out.Jtr, j)
    return SmplOutput(v=v, Jtr=j)
