"""Parity pins for the fused-rollout fast path (VERDICT r2 item 2).

Three-layer oracle chain, so a failure localizes immediately:

  humor.rollout (typed scan, reference-pinned)
    == rollout_step.rollout_scan   (flat-carry steps_in=1 special case)
    == rollout_kernel.kstep_scan_reference  (kernel data layout, XLA scan)
    == rollout_kernel.rollout_fused         (Pallas kernels; interpret
                                             mode on CPU, Mosaic on TPU)

plus gradient parity of the custom-VJP kernel path against plain
autodiff through rollout_scan. Reference behavior target:
/root/reference/humor/models/humor_model.py:785-1015 (roll_out).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.models import humor as H
from humor_tpu.ops import rollout_kernel as RK
from humor_tpu.ops import rollout_step as RS
from humor_tpu.ops import transforms as T

CFG = H.HumorConfig()
B, T_STEPS = 3, 6


@pytest.fixture(scope="module")
def params():
    return H.init_params(CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def inputs():
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    st = {
        "trans": jax.random.normal(ks[0], (B, 3)),
        "trans_vel": 0.1 * jax.random.normal(ks[1], (B, 3)),
        "root_orient": T.aa_to_rotmat(
            jax.random.normal(ks[2], (B, 3))).reshape(B, 9),
        "root_orient_vel": 0.1 * jax.random.normal(ks[3], (B, 3)),
        "pose_body": T.aa_to_rotmat(
            0.3 * jax.random.normal(ks[4], (B, 21, 3))).reshape(B, 189),
        "joints": 0.5 * jax.random.normal(ks[5], (B, 66)),
        "joints_vel": 0.1 * jax.random.normal(ks[6], (B, 66)),
    }
    z_seq = 0.5 * jax.random.normal(ks[7], (B, T_STEPS, CFG.latent_size))
    return st, z_seq


def _assert_world_close(wa, wb, atol, names=None):
    for k in names or wa.keys():
        np.testing.assert_allclose(
            np.asarray(wa[k]), np.asarray(wb[k]), atol=atol,
            err_msg=f"component {k}")


def test_rollout_scan_matches_humor_rollout(params, inputs):
    """The flat-carry steps_in=1 step == the general typed rollout."""
    st, z_seq = inputs
    ref = H.rollout(CFG, params, jax.random.PRNGKey(0), st, T_STEPS,
                    z_seq=z_seq)
    world, (pm, pv) = RS.rollout_scan(CFG, params, st, z_seq)
    _assert_world_close(ref.world, world, 1e-5)
    np.testing.assert_allclose(np.asarray(ref.prior[0]), np.asarray(pm),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.prior[1]), np.asarray(pv),
                               rtol=1e-4)


def test_kernel_layout_scan_matches(params, inputs):
    """Kernel data layout (rot9 packing, split matmuls, one-hot GN) ==
    the typed scan, before any Pallas is involved."""
    st, z_seq = inputs
    world, (pm, pv) = RS.rollout_scan(CFG, params, st, z_seq)
    worldk, (pmk, pvk) = RK.kstep_scan_reference(params, st, z_seq)
    _assert_world_close(world, worldk, 3e-5)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pmk), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pvk), rtol=3e-4)


def test_fused_kernel_forward_matches(params, inputs):
    """The pallas_call path (interpret mode off-TPU) == its own XLA scan
    over the identical kstep — isolates grid/scratch/BlockSpec wiring."""
    st, z_seq = inputs
    worldk, (pmk, pvk) = RK.kstep_scan_reference(params, st, z_seq)
    worldf, (pmf, pvf) = RK.rollout_fused(CFG, params, st, z_seq)
    _assert_world_close(worldk, worldf, 1e-6)
    np.testing.assert_allclose(np.asarray(pmk), np.asarray(pmf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pvk), np.asarray(pvf), rtol=1e-5)


def test_fused_kernel_gradients_match(params, inputs):
    """custom-VJP backward kernel == plain autodiff through the scan,
    for the TTO's differentiated inputs (init state, z_seq)."""
    st, z_seq = inputs
    cot = {k: jnp.ones((B, T_STEPS, v.shape[-1]))
           for k, v in st.items()}

    def loss_scan(st_, z_):
        world, (pm, pv) = RS.rollout_scan(CFG, params, st_, z_)
        l = sum(jnp.sum(world[k] * cot[k]) for k in world
                if k in cot)
        return l + jnp.sum(jnp.sin(pm)) + jnp.sum(jnp.log(pv))

    def loss_fused(st_, z_):
        world, (pm, pv) = RK.rollout_fused(CFG, params, st_, z_)
        l = sum(jnp.sum(world[k] * cot[k]) for k in world
                if k in cot)
        return l + jnp.sum(jnp.sin(pm)) + jnp.sum(jnp.log(pv))

    gs = jax.grad(loss_scan, argnums=(0, 1))(st, z_seq)
    gf = jax.grad(loss_fused, argnums=(0, 1))(st, z_seq)
    for k in gs[0]:
        a, b = np.asarray(gs[0][k]), np.asarray(gf[0][k])
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-4,
                                   err_msg=f"d/d init_state[{k}]")
    a, b = np.asarray(gs[1]), np.asarray(gf[1])
    scale = np.abs(a).max() + 1e-6
    np.testing.assert_allclose(b / scale, a / scale, atol=2e-4,
                               err_msg="d/d z_seq")


def test_fused_kernel_under_jit_and_vmap(params, inputs):
    """The TTO wraps the rollout in jit (and the parallel line search
    vmaps it over candidates) — the pallas_call must trace through
    both."""
    st, z_seq = inputs

    @jax.jit
    def f(z_):
        world, _ = RK.rollout_fused(CFG, params, st, z_)
        return jnp.sum(world["joints"])

    v1 = f(z_seq)
    assert np.isfinite(float(v1))

    zs = jnp.stack([z_seq, z_seq * 0.5])

    def g(z_):
        world, _ = RK.rollout_fused(CFG, params, st, z_)
        return jnp.sum(world["joints"])

    vv = jax.vmap(g)(zs)
    assert vv.shape == (2,)
    np.testing.assert_allclose(float(vv[0]), float(v1), rtol=1e-6)
