"""Evaluation runtimes: recon invariance to world translation (the
reference's +5m probe as a numeric test), sampling shapes, quant metrics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.eval import humor_eval as HE
from humor_tpu.eval import metrics as M
from humor_tpu.models import humor as H


@pytest.fixture(scope="module")
def setup():
    cfg = H.HumorConfig()
    params = H.init_params(cfg, jax.random.PRNGKey(0))
    body = synthetic_smpl_model()
    world, meta = synthetic_world_batch(0, 2, 8, model=body)
    return cfg, params, world


def test_recon_translation_invariance(setup):
    """Reconstruction errors must not change when the whole sequence is
    translated +5m (reference test_humor.py:284-286)."""
    cfg, params, world = setup
    e0 = HE.recon_error(cfg, params, world, translate=0.0)
    e5 = HE.recon_error(cfg, params, world, translate=5.0)
    for k in e0:
        assert abs(e0[k] - e5[k]) < max(3e-3, 0.02 * abs(e0[k])), (
            k, e0[k], e5[k])


def test_sample_motion_shapes(setup):
    cfg, params, world = setup
    init_state = {k: v[:, 0] for k, v in world.items()
                  if k in cfg.input_spec.names}
    out = HE.sample_motion(cfg, params, jax.random.PRNGKey(1), init_state,
                           num_steps=12)
    assert out["trans"].shape == (2, 12, 3)
    assert out["joints"].shape == (2, 12, 66)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_quant_eval_3d_metrics():
    rng = np.random.RandomState(0)
    T = 20
    gt_j = jnp.asarray(rng.randn(T, 22, 3), jnp.float32)
    pred_j = gt_j + 0.05
    obs = np.asarray(gt_j).copy()
    obs[:, 10:] = np.inf  # half occluded
    contacts = np.zeros((T, 22))
    pred = {"joints3d": pred_j, "contacts": contacts}
    gt = {"joints3d": gt_j, "contacts": contacts}
    res = M.quant_eval_3d(pred, gt, {"joints3d": jnp.asarray(obs)})
    expected = float(np.sqrt(3) * 0.05)
    np.testing.assert_allclose(res["joints3d_all"].mean(), expected,
                               rtol=1e-4)
    assert res["joints3d_vis"].size == T * 10   # joints 0..9 visible
    assert res["joints3d_occ"].size == T * 12   # joints 10..21 occluded
    assert res["contact_acc"][0] == res["contact_acc_cnt"][0]  # all agree

    agg = M.aggregate([res, res])
    assert abs(agg["joints3d_all"]["mean"] - expected) < 1e-4
    assert 0.0 <= agg["contact_acc"]["frac"] <= 1.0


def test_toe_floor_penetration():
    T = 10
    joints = np.zeros((T, 22, 3), np.float32)
    joints[..., 2] = 1.0
    lt, rt = C.SMPL_JOINTS["leftToeBase"], C.SMPL_JOINTS["rightToeBase"]
    joints[:5, lt, 2] = -0.05  # left toe penetrates 5 frames by 5cm
    counts, total, dist = M.toe_floor_penetration(jnp.asarray(joints))
    assert total == 2 * T
    assert counts[0] == 5           # below 0
    assert counts[1] == 5           # below -3cm
    assert counts[2] == 0           # not below -6cm
    np.testing.assert_allclose(dist, 0.05, atol=1e-5)


def test_accel_mag():
    # constant acceleration: x = 0.5*a*t^2 -> accel = a exactly
    t = np.arange(8, dtype=np.float32) * M.DATA_H
    joints = np.zeros((8, 22, 3), np.float32)
    joints[:, :, 0] = 0.5 * 2.0 * t[:, None] ** 2
    mag = M.joint_accel_mag(jnp.asarray(joints))
    np.testing.assert_allclose(np.asarray(mag), 2.0, rtol=1e-3)


def test_occlusion_from_masks():
    """Reference eval_utils.py:199-269: a GT joint projecting into a
    mask==1 pixel is occluded; outside-frame projections clamp."""
    from humor_tpu.eval import metrics as M

    H, W = 10, 20
    fx = fy = 10.0
    cx, cy = W / 2.0, H / 2.0
    masks = np.zeros((2, H, W), np.uint8)
    masks[:, :, : W // 2] = 1  # left half of the image occludes
    # joint A: x=-0.5, z=1 -> u = 10*-0.5+10 = 5  (left half: occluded)
    # joint B: x=+0.5, z=1 -> u = 15 (right half: visible)
    # joint C: inf GT -> never occluded
    g = np.asarray([[[-0.5, 0.0, 1.0], [0.5, 0.0, 1.0],
                     [np.inf, np.inf, np.inf]]] * 2, np.float64)
    occ = M.occlusion_from_masks(g, masks, (fx, fy, cx, cy))
    assert occ.shape == (2, 3)
    np.testing.assert_array_equal(occ, [[True, False, False]] * 2)


def test_quant_eval_2d_mask_occlusion_split():
    from humor_tpu.eval import metrics as M

    T = 3
    rng = np.random.RandomState(0)
    pred = rng.randn(T, 22, 3).astype(np.float32) + [0, 0, 3.0]
    gt16 = rng.randn(T, 16, 3).astype(np.float32) + [0, 0, 3.0]
    H, W = 8, 8
    masks = np.zeros((T, H, W), np.uint8)
    # no flags given: split must come from the masks
    out = M.quant_eval_2d(jnp.asarray(pred), jnp.asarray(gt16),
                          vis_masks=masks,
                          cam_intrins=(5.0, 5.0, 4.0, 4.0))
    assert "joints3d_comp_vis" in out and "joints3d_comp_occ" in out
    # empty masks -> nothing occluded
    assert out["joints3d_comp_occ"].size == 0
    assert out["joints3d_comp_vis"].size == out["joints3d_comp_all"].size
    # full masks -> everything occluded
    out2 = M.quant_eval_2d(jnp.asarray(pred), jnp.asarray(gt16),
                           vis_masks=np.ones_like(masks),
                           cam_intrins=(5.0, 5.0, 4.0, 4.0))
    assert out2["joints3d_comp_vis"].size == 0


def test_eval_blacklists():
    from humor_tpu.eval import metrics as M

    names = ["HumanEva_S1_Box_1_poses_548_frames_30_fps",
             "CMU_01_01_poses", "N0Sofa_03403_01_0004_win3",
             "MPH1Library_00145_01_0031"]
    assert M.filter_blacklisted(names, M.AMASS_EVAL_BLACKLIST) == names[1:]
    assert M.filter_blacklisted(names, M.RGBD_EVAL_BLACKLIST) == [
        names[0], names[1], names[3]]
    assert M.filter_blacklisted(names, M.RGB_EVAL_BLACKLIST) == names[:3]
