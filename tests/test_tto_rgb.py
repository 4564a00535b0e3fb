"""RGB-style TTO: 2D reprojection observations + floor-plane optimization
(optim_floor), the flagship camera-frame pipeline.

The synthetic body stands above a floor in a camera frame (-y up); we
observe its projected 2D joints and check the 3-stage fit with cam2prior
handling runs finite and reduces the reprojection error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.body_model import constants as C
from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.fitting import energies as E
from humor_tpu.fitting import geometry as geo
from humor_tpu.fitting import optimizer as O
from humor_tpu.models import humor as H
from humor_tpu.models import vposer as vp

B, T = 2, 6
# synthetic body has 22 joints and no extra vertex joints; build a valid
# 25-entry smpl->openpose map into those 22 joints (repeats are fine)
SYN_SMPL2OP = tuple(int(i % C.NUM_SMPL_JOINTS) for i in range(25))


@pytest.fixture(scope="module")
def models():
    vcfg = vp.VPoserConfig(hidden=32)
    hcfg = H.HumorConfig()
    return O.TTOModels(
        body=synthetic_smpl_model(),
        vposer_cfg=vcfg,
        vposer=vp.init_params(vcfg, jax.random.PRNGKey(1)),
        humor_cfg=hcfg,
        humor=H.init_params(hcfg, jax.random.PRNGKey(2)),
    )


@pytest.fixture(scope="module")
def observed(models):
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(B, T, models.vposer_cfg.latent_dim) * 0.3,
                    jnp.float32)
    pose = vp.latent2pose(models.vposer_cfg, models.vposer, z)
    # camera frame: -y up, body ~3m in front of camera, above floor y=0.5
    trans = jnp.asarray(
        rng.randn(B, T, 3).astype(np.float32) * 0.05
        + np.asarray([0.0, -0.6, 3.0], np.float32))
    ro = jnp.asarray(np.tile(rng.randn(B, 1, 3) * 0.2, (1, T, 1)),
                     jnp.float32)
    pred = O.smpl_results(models.body, trans, ro, pose,
                          jnp.zeros((B, C.BETA_SIZE)))
    jfull = jnp.concatenate([pred["joints3d"], pred["joints3d_extra"]],
                            axis=2)
    op3d = jfull[:, :, np.asarray(SYN_SMPL2OP)]
    cam_f = jnp.asarray(np.tile([500.0, 500.0], (B, 1)), jnp.float32)
    cam_c = jnp.asarray(np.tile([320.0, 240.0], (B, 1)), jnp.float32)
    pts = op3d.reshape(B * T, 25, 3)
    eye = jnp.broadcast_to(jnp.eye(3), (B * T, 3, 3))
    zero = jnp.zeros((B * T, 3))
    uv = geo.perspective_projection(
        pts, eye, zero, jnp.repeat(cam_f, T, 0), jnp.repeat(cam_c, T, 0))
    uv = uv.reshape(B, T, 25, 2)
    conf = jnp.ones((B, T, 25, 1))
    return {
        "joints2d": jnp.concatenate([uv, conf], axis=-1),
        "floor_plane": jnp.asarray(
            np.tile([0.0, -1.0, 0.0, 0.5], (B, 1)), jnp.float32),
        "cam_f": cam_f,
        "cam_center": cam_c,
    }


def test_cam_frame_rigid_map(models):
    """The stage-3 closure replaces the camera-frame LBS pass with a
    rigid map of the prior-frame points (optimizer.stage3_loss_fn):
    with cam params trans_c = R^T(trans - trans[:,0]) - t and orient_c =
    R^T orient (apply_cam2prior inverse), every skinned point must obey
    p_cam = R^T(p - trans[:,0] - j0) + j0 - t, j0 the shaped rest root
    joint. Pin that identity against an actual second skinning pass."""
    from humor_tpu.body_model import smpl as smpl_lib
    from humor_tpu.ops import transforms

    rng = np.random.RandomState(3)
    betas = jnp.asarray(rng.randn(B, C.BETA_SIZE).astype(np.float32) * 0.5)
    trans = jnp.asarray(rng.randn(B, T, 3).astype(np.float32))
    ro = jnp.asarray(rng.randn(B, T, 3).astype(np.float32) * 0.6)
    z = jnp.asarray(rng.randn(B, T, models.vposer_cfg.latent_dim)
                    .astype(np.float32) * 0.3)
    pose = vp.latent2pose(models.vposer_cfg, models.vposer, z)

    R = transforms.aa_to_rotmat(
        jnp.asarray(rng.randn(B, 3).astype(np.float32)))
    t = jnp.asarray(rng.randn(B, 3).astype(np.float32))
    rh = jnp.asarray(rng.rand(B, 1).astype(np.float32))

    cam = geo.apply_cam2prior(trans, ro, R, t, rh,
                              jnp.zeros((B,), jnp.int32), inverse=True)
    direct = O.smpl_results(models.body, cam["trans"], cam["root_orient"],
                            pose, betas, verts="keypt")

    prior = O.smpl_results(models.body, trans, ro, pose, betas,
                           verts="keypt")
    j0 = smpl_lib.rest_root_joint(models.body, betas)
    shift = (trans[:, 0] + j0)[:, None, None]
    off = (j0 - t)[:, None, None]

    def to_cam(p):
        return jnp.einsum("bji,btnj->btni", R, p - shift,
                          precision=jax.lax.Precision.HIGHEST) + off

    for key in ("joints3d", "verts3d"):
        np.testing.assert_allclose(np.asarray(to_cam(prior[key])),
                                   np.asarray(direct[key]),
                                   atol=2e-5, err_msg=key)


def test_rgb_fit_runs_and_improves(models, observed):
    w1 = E.StageWeights(joints2d=0.001)
    w2 = E.StageWeights(joints2d=0.001, pose_prior=4e-4, shape_prior=6e-3,
                        joints3d_smooth=1.0)
    w3 = E.StageWeights(joints2d=0.001, pose_prior=4e-4, shape_prior=6e-3,
                        motion_prior=1e-4, joint_consistency=1.0,
                        bone_length=1.0, contact_height=1.0,
                        contact_vel=1.0, floor_reg=0.1)
    cfg = O.TTOConfig(
        seq_len=T, stage_weights=(w1, w2, w3),
        energy=E.EnergyConfig(smpl2op_map=SYN_SMPL2OP),
        num_iters=(6, 6, 4), optim_floor=True,
        stage3_tune_init_state=False)
    res = O.run(cfg, models, observed)

    for stage in ("stage1", "stage2", "stage3"):
        hist = np.asarray(res.losses[stage])
        assert np.all(np.isfinite(hist)), (stage, hist)
    assert np.asarray(res.losses["stage1"])[-1] < \
        np.asarray(res.losses["stage1"])[0]
    assert np.asarray(res.losses["stage2"])[-1] < \
        np.asarray(res.losses["stage2"])[0] * 1.001

    f = res.final
    assert f["floor_plane"].shape == (B, 4)
    assert f["prior_trans"].shape == (B, T, 3)
    for k, v in f.items():
        assert np.all(np.isfinite(np.asarray(v))), f"non-finite {k}"
    # depth initialization from bone-length ratio should land within a
    # couple meters of the true 3m depth, and stage1 should keep it sane
    z_fit = float(np.asarray(f["trans"])[..., 2].mean())
    assert 0.5 < z_fit < 8.0, z_fit
