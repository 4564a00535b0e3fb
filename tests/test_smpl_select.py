"""Selective-vertex LBS: joints identical to the full forward; selected
vertices match their full-forward counterparts."""

import jax
import numpy as np
import jax.numpy as jnp

from humor_tpu.body_model import smpl as S


def test_vert_selection_matches_full():
    body = S.synthetic_smpl_model()
    rng = np.random.RandomState(0)
    B = 4
    root = jnp.asarray(rng.randn(B, 3) * 0.3, jnp.float32)
    pose = jnp.asarray(rng.randn(B, 63) * 0.2, jnp.float32)
    betas = jnp.asarray(rng.randn(B, 16) * 0.5, jnp.float32)
    trans = jnp.asarray(rng.randn(B, 3), jnp.float32)

    full = S.forward(body, root, pose, betas, trans)
    sel_ids = np.asarray([3, 10, 100, 200], np.int32)
    sel = S.forward(body, root, pose, betas, trans, vert_ids=sel_ids)

    np.testing.assert_allclose(np.asarray(sel.Jtr), np.asarray(full.Jtr),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel.v),
                               np.asarray(full.v[:, sel_ids]), atol=1e-5)


def test_empty_selection_joints_only():
    body = S.synthetic_smpl_model()
    rng = np.random.RandomState(1)
    B = 2
    root = jnp.asarray(rng.randn(B, 3) * 0.3, jnp.float32)
    pose = jnp.asarray(rng.randn(B, 63) * 0.2, jnp.float32)
    betas = jnp.zeros((B, 16))
    trans = jnp.zeros((B, 3))

    full = S.forward(body, root, pose, betas, trans)
    none = S.forward(body, root, pose, betas, trans,
                     vert_ids=np.zeros((0,), np.int32))
    np.testing.assert_allclose(np.asarray(none.Jtr),
                               np.asarray(full.Jtr), atol=1e-5)
    assert none.v.shape[1] == 0


def test_selection_with_vtx_joints():
    """Extra OpenPose vertex joints survive vertex selection."""
    from humor_tpu.body_model.smpl import StaticArray

    body = S.synthetic_smpl_model()
    # give the synthetic body 3 extra vertex joints
    body2 = S.SmplModel(
        v_template=body.v_template, shapedirs=body.shapedirs,
        posedirs=body.posedirs, j_regressor=body.j_regressor,
        lbs_weights=body.lbs_weights, parents=body.parents,
        faces=body.faces,
        vtx_joint_ids=StaticArray(np.asarray([5, 50, 150], np.int32)))
    rng = np.random.RandomState(2)
    B = 2
    root = jnp.asarray(rng.randn(B, 3) * 0.3, jnp.float32)
    pose = jnp.asarray(rng.randn(B, 63) * 0.2, jnp.float32)
    betas = jnp.zeros((B, 16))
    trans = jnp.zeros((B, 3))

    full = S.forward(body2, root, pose, betas, trans)
    sel = S.forward(body2, root, pose, betas, trans,
                    vert_ids=np.zeros((0,), np.int32))
    assert full.Jtr.shape[1] == 22 + 3
    np.testing.assert_allclose(np.asarray(sel.Jtr),
                               np.asarray(full.Jtr), atol=1e-5)
    assert sel.v.shape[1] == 0
