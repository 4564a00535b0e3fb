"""SMPL skeleton constants shared across the framework.

Behavioral parity with /root/reference/humor/body_model/utils.py:5-19 and
/root/reference/humor/datasets/amass_utils.py:22-27 — these are public,
model-defined constants (joint ordering of the SMPL body, kinematic tree,
chosen mocap-marker vertices), not code.
"""

from __future__ import annotations

import numpy as np

# 22 SMPL body joints (root + 21), canonical ordering.
SMPL_JOINT_NAMES = [
    "hips", "leftUpLeg", "rightUpLeg", "spine", "leftLeg", "rightLeg",
    "spine1", "leftFoot", "rightFoot", "spine2", "leftToeBase",
    "rightToeBase", "neck", "leftShoulder", "rightShoulder", "head",
    "leftArm", "rightArm", "leftForeArm", "rightForeArm", "leftHand",
    "rightHand",
]
SMPL_JOINTS = {name: i for i, name in enumerate(SMPL_JOINT_NAMES)}
NUM_SMPL_JOINTS = len(SMPL_JOINT_NAMES)  # 22
NUM_BODY_JOINTS = NUM_SMPL_JOINTS - 1    # 21 (no root)

# parent[i] is the kinematic parent of joint i (-1 for root).
SMPL_PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 12, 12, 13, 14,
                16, 17, 18, 19]

# Joints whose binary ground-contact state the model predicts
# (reference amass_utils.py:22-23).
CONTACT_ORDERING = [
    "hips", "leftLeg", "rightLeg", "leftFoot", "rightFoot", "leftToeBase",
    "rightToeBase", "leftHand", "rightHand",
]
CONTACT_INDS = [SMPL_JOINTS[n] for n in CONTACT_ORDERING]
NUM_CONTACTS = len(CONTACT_ORDERING)  # 9

# 43 virtual mocap-marker vertex ids on the SMPL mesh used as "keypoints"
# (reference body_model/utils.py:17-19).
KEYPT_VERTS = [
    4404, 920, 3076, 3169, 823, 4310, 1010, 1085, 4495, 4569, 6615, 3217,
    3313, 6713, 6785, 3383, 6607, 3207, 1241, 1508, 4797, 4122, 1618, 1569,
    5135, 5040, 5691, 5636, 5404, 2230, 2173, 2108, 134, 3645, 6543, 3123,
    3024, 4194, 1306, 182, 3694, 4294, 744,
]
NUM_KEYPT_VERTS = len(KEYPT_VERTS)  # 43

BETA_SIZE = 16

# Default asset locations (same layout as the reference repo so users can
# reuse their downloaded body models).
SMPLH_PATH = "./body_models/smplh"
SMPL_PATH = "./body_models/smpl"
SMPLX_PATH = "./body_models/smplx"
VPOSER_PATH = "./body_models/vposer_v1_0"


def smpl_to_openpose(model_type: str = "smplh", use_hands: bool = True,
                     openpose_format: str = "coco25") -> np.ndarray:
    """Permutation mapping SMPL-family joints to OpenPose keypoint order.

    Parity with reference body_model/utils.py:26-135 (COCO-25 / COCO-19
    orderings are fixed public specs).
    """
    if openpose_format.lower() == "coco25":
        if model_type == "smpl":
            return np.array(
                [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 25, 26,
                 27, 28, 29, 30, 31, 32, 33, 34], dtype=np.int32)
        if model_type == "smplh":
            body = np.array(
                [52, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 53, 54,
                 55, 56, 57, 58, 59, 60, 61, 62], dtype=np.int32)
            if not use_hands:
                return body
            lhand = np.array(
                [20, 34, 35, 36, 63, 22, 23, 24, 64, 25, 26, 27, 65, 31, 32,
                 33, 66, 28, 29, 30, 67], dtype=np.int32)
            rhand = np.array(
                [21, 49, 50, 51, 68, 37, 38, 39, 69, 40, 41, 42, 70, 46, 47,
                 48, 71, 43, 44, 45, 72], dtype=np.int32)
            return np.concatenate([body, lhand, rhand])
        raise ValueError(f"unsupported model type {model_type!r}")
    if openpose_format.lower() == "coco19":
        if model_type == "smplh":
            body = np.array(
                [52, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 53, 54,
                 55, 56], dtype=np.int32)
            if not use_hands:
                return body
            lhand = np.array(
                [20, 34, 35, 36, 57, 22, 23, 24, 58, 25, 26, 27, 59, 31, 32,
                 33, 60, 28, 29, 30, 61], dtype=np.int32)
            rhand = np.array(
                [21, 49, 50, 51, 62, 37, 38, 39, 63, 40, 41, 42, 64, 46, 47,
                 48, 65, 43, 44, 45, 66], dtype=np.int32)
            return np.concatenate([body, lhand, rhand])
        raise ValueError(f"unsupported model type {model_type!r}")
    raise ValueError(f"unsupported openpose format {openpose_format!r}")


# OpenPose BODY_25 constants used by the fitting losses
# (reference fitting/fitting_utils.py:678-682).
OP_NUM_JOINTS = 25
OP_IGNORE_JOINTS = [1, 9, 12]  # midhip and spine/neck interpolations
OP_EDGE_LIST = [
    [1, 8], [1, 2], [1, 5], [2, 3], [3, 4], [5, 6], [6, 7], [8, 9], [9, 10],
    [10, 11], [8, 12], [12, 13], [13, 14], [1, 0], [0, 15], [15, 17], [0, 16],
    [16, 18], [14, 19], [19, 20], [14, 21], [11, 22], [22, 23], [11, 24],
]
# indices to swap under a left/right image flip
OP_FLIP_MAP = [
    (2, 5), (3, 6), (4, 7), (9, 12), (10, 13), (11, 14), (15, 16), (17, 18),
    (22, 19), (23, 20), (24, 21),
]
