"""Full-model numerical parity against the reference HumorModel.

Builds the reference torch model (random weights), imports its state dict
into our pytree, and compares:
  * posterior / prior distributions,
  * decode incl. delta-rotation composition,
  * per-step canonicalization (apply_world2local_trans),
  * the full autoregressive roll_out with a fixed latent sequence —
    the highest-risk path (SURVEY.md §7 'hard parts').

The reference tree is imported READ-ONLY as a behavioral oracle, with
smplx stubbed out (it is only needed for HuMoR-Qual body models).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/humor"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    # smplx is only used by the (unused here) body-model path
    smplx_stub = types.ModuleType("smplx")
    smplx_stub.__path__ = []  # mark as package
    smplx_stub.SMPL = smplx_stub.SMPLH = smplx_stub.SMPLX = object
    vertex_ids_stub = types.ModuleType("smplx.vertex_ids")
    vertex_ids_stub.vertex_ids = {"smplh": {}, "smplx": {}}
    utils_stub = types.ModuleType("smplx.utils")
    utils_stub.Struct = dict
    body_models_stub = types.ModuleType("smplx.body_models")
    sys.modules.setdefault("smplx", smplx_stub)
    sys.modules.setdefault("smplx.vertex_ids", vertex_ids_stub)
    sys.modules.setdefault("smplx.utils", utils_stub)
    sys.modules.setdefault("smplx.body_models", body_models_stub)
    import torch
    from models import humor_model as RHM

import jax
import jax.numpy as jnp

from humor_tpu.models import humor as H
from humor_tpu.utils.import_torch import humor_params_from_state_dict


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    cfg = H.HumorConfig()
    ref = RHM.HumorModel(in_rot_rep=cfg.in_rot_rep,
                         out_rot_rep=cfg.out_rot_rep,
                         latent_size=cfg.latent_size,
                         model_data_config=cfg.model_data_config,
                         steps_in=cfg.steps_in)
    ref.eval()
    # randomize GroupNorm affines so parity is meaningful
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.GroupNorm):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = humor_params_from_state_dict(sd)
    return cfg, ref, params


def _rand_state(B, seed=0):
    """Random-but-plausible canonical state dict (matrix rots valid)."""
    from humor_tpu.ops import transforms as T

    rng = np.random.RandomState(seed)
    aa = rng.randn(B, 3).astype(np.float32) * 0.5
    pose_aa = rng.randn(B, 21, 3).astype(np.float32) * 0.3
    root = np.asarray(T.aa_to_rotmat(jnp.asarray(aa))).reshape(B, 9)
    pose = np.asarray(T.aa_to_rotmat(jnp.asarray(pose_aa))).reshape(B, -1)
    joints = rng.randn(B, 66).astype(np.float32) * 0.3
    joints[:, 2::3] += 0.9
    return {
        "trans": np.zeros((B, 3), np.float32),
        "trans_vel": rng.randn(B, 3).astype(np.float32) * 0.5,
        "root_orient": root,
        "root_orient_vel": rng.randn(B, 3).astype(np.float32) * 0.5,
        "pose_body": pose,
        "joints": joints,
        "joints_vel": rng.randn(B, 66).astype(np.float32) * 0.5,
    }


def _pack(cfg, state):
    return np.concatenate([state[k] for k in cfg.input_spec.names],
                          axis=-1)


def test_prior_posterior_parity(models):
    cfg, ref, params = models
    B = 4
    past = _pack(cfg, _rand_state(B, 0))
    nxt = _pack(cfg, _rand_state(B, 1))

    with torch.no_grad():
        rm, rv = ref.prior(torch.from_numpy(past))
        qm_r, qv_r = ref.posterior(torch.from_numpy(past),
                                   torch.from_numpy(nxt))
    pm, pv = H.prior(cfg, params, jnp.asarray(past))
    qm, qv = H.posterior(cfg, params, jnp.asarray(past), jnp.asarray(nxt))
    np.testing.assert_allclose(np.asarray(pm), rm.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pv), rv.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(qm), qm_r.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(qv), qv_r.numpy(), rtol=2e-3,
                               atol=2e-4)


def test_decode_parity(models):
    """decode + delta composition + split_output vs ours."""
    cfg, ref, params = models
    B = 4
    past = _pack(cfg, _rand_state(B, 2))
    rng = np.random.RandomState(3)
    z = rng.randn(B, cfg.latent_size).astype(np.float32) * 0.5

    with torch.no_grad():
        dec = ref.decode(torch.from_numpy(z), torch.from_numpy(past))
        ref_out = ref.split_output(dec, convert_rots=True)
    ours = H.decode(cfg, params, jnp.asarray(z), jnp.asarray(past))

    for name in ("trans", "trans_vel", "root_orient_vel", "joints",
                 "joints_vel"):
        np.testing.assert_allclose(
            np.asarray(ours[name]), ref_out[name].numpy().reshape(B, -1),
            atol=3e-4, err_msg=name)
    for name in ("root_orient", "pose_body"):
        np.testing.assert_allclose(
            np.asarray(ours[name]), ref_out[name].numpy().reshape(B, -1),
            atol=3e-4, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(ours["contacts"]),
        ref_out["contacts"].numpy().reshape(B, -1), atol=3e-4)


def test_rollout_parity(models):
    """Full T-step roll_out with a fixed z sequence: trajectories must
    match, validating delta composition + per-step canonicalization +
    global-frame accumulation end to end."""
    cfg, ref, params = models
    B, T = 2, 6
    state = _rand_state(B, 4)
    rng = np.random.RandomState(5)
    z_seq = rng.randn(B, T, cfg.latent_size).astype(np.float32) * 0.3

    # reference: roll_out(x_past=None, init dict (B,1,D), T, z_seq)
    ref_in = {k: torch.from_numpy(v[:, None]) for k, v in state.items()}
    with torch.no_grad():
        ref_out = ref.roll_out(None, ref_in, T,
                               z_seq=torch.from_numpy(z_seq),
                               canonicalize_input=True)
    ours = H.rollout(cfg, params, jax.random.PRNGKey(0),
                     {k: jnp.asarray(v) for k, v in state.items()},
                     T, z_seq=jnp.asarray(z_seq),
                     canonicalize_input=True)

    for name in ("trans", "joints", "root_orient", "pose_body"):
        ref_v = ref_out[name].numpy().reshape(B, T, -1)
        our_v = np.asarray(ours.world[name]).reshape(B, T, -1)
        np.testing.assert_allclose(our_v, ref_v, atol=5e-3,
                                   err_msg=f"rollout {name}")


def test_canonicalization_parity(models):
    """apply_world2local_trans vs our apply_world2local on a typed state."""
    cfg, ref, params = models
    from humor_tpu.models.canonical import FrameTransform, apply_world2local
    from humor_tpu.ops import transforms as T

    B = 4
    state = _rand_state(B, 6)
    state["trans"] = np.random.RandomState(7).randn(B, 3).astype(
        np.float32)
    rng = np.random.RandomState(8)
    rot = np.asarray(T.compute_world2aligned_mat(jnp.asarray(
        state["root_orient"].reshape(B, 3, 3))))
    w2l_trans = np.concatenate(
        [-state["trans"][:, :2], np.zeros((B, 1), np.float32)], axis=1)
    t2j = np.concatenate(
        [rng.randn(B, 2).astype(np.float32),
         np.zeros((B, 1), np.float32)], axis=1)

    # reference operates on (B, 1, D) dicts
    tdict = {k: torch.from_numpy(v[:, None]) for k, v in state.items()}
    with torch.no_grad():
        ref_local = ref.apply_world2local_trans(
            torch.from_numpy(w2l_trans), torch.from_numpy(rot),
            torch.from_numpy(t2j), tdict, dict(), invert=False)
    ours_local = apply_world2local(
        FrameTransform(jnp.asarray(rot), jnp.asarray(w2l_trans),
                       jnp.asarray(t2j)),
        {k: jnp.asarray(v) for k, v in state.items()})

    for name in state:
        ref_v = ref_local[name].numpy().reshape(B, -1)
        np.testing.assert_allclose(np.asarray(ours_local[name]), ref_v,
                                   atol=2e-4, err_msg=name)
