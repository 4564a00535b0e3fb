"""Single flat-carry rollout step — the shared core of the XLA scan path
and the Pallas fused-rollout kernel.

`rollout()` in humor_tpu.models.humor carries a typed dict window
(general: steps_in >= 1, optional SMPL feedback). The TTO stage-3 hot
path is the steps_in=1, z_seq-driven special case; this module expresses
THAT case as a pure function over flat arrays so the same code can be

  * scanned by XLA (oracle / fallback), and
  * traced inside a Pallas TPU kernel (grid over steps, weights resident
    in VMEM) — including `jax.vjp` of it for the backward kernel, so the
    kernel's gradients come from JAX autodiff, never hand derivation.

Behavioral parity: the step math is the reference roll_out inner loop
(/root/reference/humor/models/humor_model.py:785-1015) in the
steps_in=1 configuration; equivalence to humor.rollout is pinned by
tests/test_rollout_kernel.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from humor_tpu.models import humor as H
from humor_tpu.models import state as state_lib
from humor_tpu.models.canonical import FrameTransform, apply_world2local
from humor_tpu.ops import transforms

_HI = jax.lax.Precision.HIGHEST


class StepCarry(NamedTuple):
    local: Dict[str, jnp.ndarray]   # canonical-frame typed state (B, D)
    g_rot: jnp.ndarray              # (B, 3, 3) running global rotation
    g_trans: jnp.ndarray            # (B, 3) running global translation


class StepOut(NamedTuple):
    world: Dict[str, jnp.ndarray]   # world-frame typed state (B, D)
    prior_mean: jnp.ndarray         # (B, latent)
    prior_var: jnp.ndarray          # (B, latent)


def rollout_step(cfg: H.HumorConfig, params: Dict, carry: StepCarry,
                 z: jnp.ndarray, t2j: jnp.ndarray
                 ) -> Tuple[StepCarry, StepOut]:
    """One deterministic rollout transition (steps_in=1, z given).

    Identical math to the humor.rollout scan body with smpl_joint_fn=None:
    prior -> decode(z) -> world un-canonicalization -> window slide +
    re-canonicalization (reference humor_model.py:960-994).
    """
    local, g_rot, g_trans = carry
    B = local["trans"].shape[0]
    dtype = local["trans"].dtype

    past_in = H.state_to_input(cfg, local)           # (B, D_in)
    pm, pv = H.prior(cfg, params, past_in)
    pred = H.decode(cfg, params, z, past_in)

    g_xform = FrameTransform(g_rot, g_trans, t2j)
    world = apply_world2local(g_xform, pred, invert=True)

    step_frame = FrameTransform(
        rot=transforms.compute_world2aligned_mat(
            pred["root_orient"].reshape(B, 3, 3)),
        trans=jnp.concatenate(
            [-pred["trans"][..., :2], jnp.zeros((B, 1), dtype)], axis=-1),
        trans2joint=t2j,
    )
    feed = {k: pred[k] for k in cfg.input_spec.names}
    next_local = apply_world2local(step_frame, feed)

    new_g_trans = jnp.concatenate(
        [-world["trans"][..., :2], jnp.zeros((B, 1), dtype)], axis=-1)
    new_g_rot = jnp.matmul(g_rot, step_frame.rot, precision=_HI)

    return (StepCarry(next_local, new_g_rot, new_g_trans),
            StepOut(world, pm, pv))


def init_carry(cfg: H.HumorConfig, init_state: Dict[str, jnp.ndarray]
               ) -> Tuple[StepCarry, jnp.ndarray]:
    """Initial (carry, trans2joint) from a typed world init state (B, D)
    components, matrix rotations — matching humor.rollout with
    canonicalize_input=False (the TTO convention: the caller already
    canonicalized)."""
    B = init_state["trans"].shape[0]
    dtype = init_state["trans"].dtype
    local0 = {k: init_state[k] for k in cfg.input_spec.names}
    if cfg.need_trans2joint:
        t2j = jnp.concatenate(
            [-local0["joints"][:, :2], jnp.zeros((B, 1), dtype)], axis=-1)
    else:
        t2j = jnp.zeros((B, 3), dtype)
    g_rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
    g_trans = jnp.zeros((B, 3), dtype)
    return StepCarry(local0, g_rot, g_trans), t2j


def rollout_scan(cfg: H.HumorConfig, params: Dict,
                 init_state: Dict[str, jnp.ndarray],
                 z_seq: jnp.ndarray) -> Tuple[Dict[str, jnp.ndarray],
                                              Tuple[jnp.ndarray,
                                                    jnp.ndarray]]:
    """Reference XLA path over rollout_step: scan of T steps.
    Returns (world components (B, T, D), (prior_mean, prior_var))."""
    carry0, t2j = init_carry(cfg, init_state)
    z_steps = jnp.swapaxes(z_seq, 0, 1)

    def body(c, z):
        c2, out = rollout_step(cfg, params, c, z, t2j)
        return c2, out

    _, outs = jax.lax.scan(body, carry0, z_steps)
    world = {k: jnp.swapaxes(v, 0, 1) for k, v in outs.world.items()}
    return world, (jnp.swapaxes(outs.prior_mean, 0, 1),
                   jnp.swapaxes(outs.prior_var, 0, 1))
