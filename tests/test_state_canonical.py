"""Tests for the typed state spec and heading canonicalization."""

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.models import state as S
from humor_tpu.models.canonical import (
    FrameTransform, apply_world2local, frame_from_state,
)
from humor_tpu.ops import transforms as T


def make_random_state(key, batch=(4,), with_contacts=True):
    ks = jax.random.split(key, 8)
    st = {
        "trans": jax.random.normal(ks[0], (*batch, 3)),
        "trans_vel": jax.random.normal(ks[1], (*batch, 3)),
        "root_orient": T.aa_to_rotmat(
            jax.random.normal(ks[2], (*batch, 3))).reshape(*batch, 9),
        "root_orient_vel": jax.random.normal(ks[3], (*batch, 3)),
        "pose_body": T.aa_to_rotmat(
            jax.random.normal(ks[4], (*batch, 21, 3))).reshape(*batch, 189),
        "joints": jax.random.normal(ks[5], (*batch, 66)),
        "joints_vel": jax.random.normal(ks[6], (*batch, 66)),
    }
    if with_contacts:
        st["contacts"] = jax.random.uniform(ks[7], (*batch, 9))
    return st


class TestStateSpec:
    def test_dims_default_config(self):
        """Input 339-d for mat, decoder-out 216-d for aa+contacts
        (SURVEY.md §2.4)."""
        in_spec, out_spec, mat_spec, pc = S.make_specs(
            "smpl+joints+contacts", "mat", "aa")
        assert pc
        assert in_spec.total_dim == 339
        assert out_spec.total_dim == 216
        assert mat_spec.total_dim == 348

    def test_pack_unpack_roundtrip(self):
        st = make_random_state(jax.random.PRNGKey(0), with_contacts=False)
        spec = S.StateSpec(
            ("trans", "trans_vel", "root_orient", "root_orient_vel",
             "pose_body", "joints", "joints_vel"), "mat")
        x = spec.pack(st)
        assert x.shape == (4, 339)
        st2 = spec.unpack(x)
        for k in st:
            np.testing.assert_array_equal(st[k], st2[k])

    def test_name_lists(self):
        assert S.data_name_list("smpl+joints") == [
            "trans", "trans_vel", "root_orient", "root_orient_vel",
            "pose_body", "joints", "joints_vel"]
        assert S.data_dim("pose_body", 3) == 63
        assert S.data_dim("joints") == 66
        assert S.data_dim("contacts") == 9


class TestCanonicalization:
    def test_forward_inverse_roundtrip(self):
        key = jax.random.PRNGKey(1)
        st = make_random_state(key)
        frame = frame_from_state(st)
        local = apply_world2local(frame, st)
        back = apply_world2local(frame, local, invert=True)
        for k in st:
            np.testing.assert_allclose(np.asarray(st[k]),
                                       np.asarray(back[k]), atol=1e-4)

    def test_canonical_state_properties(self):
        """Canonicalized state: root trans xy = 0, heading along +x."""
        key = jax.random.PRNGKey(2)
        st = make_random_state(key)
        frame = frame_from_state(st)
        local = apply_world2local(frame, st)
        np.testing.assert_allclose(np.asarray(local["trans"][:, :2]), 0.0,
                                   atol=1e-5)
        # z-height unchanged
        np.testing.assert_allclose(np.asarray(local["trans"][:, 2]),
                                   np.asarray(st["trans"][:, 2]), atol=1e-5)
        R = local["root_orient"].reshape(-1, 3, 3)
        body_right = -R[:, :, 0]
        horiz = body_right[:, :2]
        horiz = horiz / jnp.linalg.norm(horiz, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(horiz[:, 0]), 1.0, atol=1e-3)

    def test_canonicalization_invariance_to_world_shift(self):
        """The +5m-translation probe from the reference eval
        (test_humor.py:284-286): canonical local state must be identical
        regardless of world xy translation. (Note: HuMoR canonicalization
        is deliberately NOT invariant to world *rotation* — the
        trans2joint offset rotates with the world, matching the reference
        joint transform at humor_model.py:737-750.)"""
        key = jax.random.PRNGKey(3)
        st = make_random_state(key)

        shift = jnp.array([5.0, -3.0, 0.0])
        st2 = dict(st)
        st2["trans"] = st2["trans"] + shift
        st2["joints"] = (st2["joints"].reshape(4, 22, 3) + shift).reshape(4, 66)

        loc1 = apply_world2local(frame_from_state(st), st)
        loc2 = apply_world2local(frame_from_state(st2), st2)
        for k in ["trans", "trans_vel", "root_orient", "root_orient_vel",
                  "pose_body", "joints", "joints_vel", "contacts"]:
            np.testing.assert_allclose(np.asarray(loc1[k]),
                                       np.asarray(loc2[k]), atol=1e-3,
                                       err_msg=f"component {k}")

    def test_vectors_only_rotate(self):
        key = jax.random.PRNGKey(4)
        st = make_random_state(key)
        frame = frame_from_state(st)
        local = apply_world2local(frame, st)
        # velocity norms preserved
        v1 = np.linalg.norm(np.asarray(st["joints_vel"]).reshape(4, 22, 3),
                            axis=-1)
        v2 = np.linalg.norm(np.asarray(local["joints_vel"]).reshape(4, 22, 3),
                            axis=-1)
        np.testing.assert_allclose(v1, v2, atol=1e-4)
        # pose_body and contacts untouched
        np.testing.assert_array_equal(np.asarray(st["pose_body"]),
                                      np.asarray(local["pose_body"]))
        np.testing.assert_array_equal(np.asarray(st["contacts"]),
                                      np.asarray(local["contacts"]))

    def test_offset_point_pivot(self):
        """joints rotate about the root-joint ground projection."""
        key = jax.random.PRNGKey(5)
        st = make_random_state(key)
        frame = frame_from_state(st)
        local = apply_world2local(frame, st)
        # root joint xy in local frame equals its offset relative to trans:
        # world root-joint xy + world2local trans xy rotated... simpler
        # invariant: distance between joints preserved
        j1 = np.asarray(st["joints"]).reshape(4, 22, 3)
        j2 = np.asarray(local["joints"]).reshape(4, 22, 3)
        d1 = np.linalg.norm(j1[:, :1] - j1, axis=-1)
        d2 = np.linalg.norm(j2[:, :1] - j2, axis=-1)
        np.testing.assert_allclose(d1, d2, atol=1e-4)
