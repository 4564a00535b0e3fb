"""HuMoR transition CVAE — TPU-native JAX implementation.

The model learns the distribution of the next body state x_t given the
previous state x_{t-1} through a latent transition z_t:

    posterior  q(z | x_{t-1}, x_t)   4x1024 MLP -> (mu, var)
    cond prior p(z | x_{t-1})        4x1024 MLP -> (mu, var)
    decoder    x_t = f(z, x_{t-1})   1024,1024,512 MLP with z skip-connected
                                     to every layer; predicts *residuals*
                                     (additive for vectors, composed rotation
                                     R_delta @ R_prev for rotations).

Behavioral parity target: /root/reference/humor/models/humor_model.py
(class HumorModel: forward :352, single_step :374, prior :407, posterior
:420, rsample :437, decode :445, split_output :316, roll_out :785,
sample_step :1019, infer_global_seq :1061, scheduled_sampling :500).

TPU-first design (not a port):
  * pure functions over a params pytree — jit/vmap/scan/grad compose freely;
  * every temporal loop (`roll_out`, `scheduled_sampling`,
    `infer_global_seq`) is a single `lax.scan` with a typed state carry —
    the reference re-canonicalizes with Python loops per step;
  * canonicalization is the typed-state transform in
    humor_tpu.models.canonical, identical math to the dataset-side numpy
    version so train/test/TTO all share one implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from humor_tpu.models import state as state_lib
from humor_tpu.models.canonical import (
    FrameTransform,
    apply_world2local,
    frame_from_state,
)
from humor_tpu.models.state import ROT_REP_SIZE, StateSpec, make_specs
from humor_tpu.ops import transforms
from humor_tpu.ops.mlp import init_mlp, mlp_apply

_HI = jax.lax.Precision.HIGHEST

MLP_WIDTH = 1024


@dataclass(frozen=True)
class HumorConfig:
    in_rot_rep: str = "mat"
    out_rot_rep: str = "aa"
    latent_size: int = 48
    steps_in: int = 1
    conditional_prior: bool = True
    output_delta: bool = True
    model_data_config: str = "smpl+joints+contacts"
    detach_sched_samp: bool = True
    # optional low-precision matmul policy for the MLP stacks ("bfloat16"
    # halves HBM weight traffic on TPU); None = full f32. Geometry,
    # canonicalization, and LBS always stay f32.
    compute_dtype: Optional[str] = None

    # --- derived static metadata ---
    @property
    def specs(self) -> Tuple[StateSpec, StateSpec, StateSpec, bool]:
        return make_specs(self.model_data_config, self.in_rot_rep,
                          self.out_rot_rep)

    @property
    def input_spec(self) -> StateSpec:
        return self.specs[0]

    @property
    def out_spec(self) -> StateSpec:
        return self.specs[1]

    @property
    def mat_spec(self) -> StateSpec:
        return self.specs[2]

    @property
    def pred_contacts(self) -> bool:
        return self.specs[3]

    @property
    def input_data_dim(self) -> int:
        return self.input_spec.total_dim

    @property
    def past_data_dim(self) -> int:
        return self.steps_in * self.input_data_dim

    @property
    def output_data_dim(self) -> int:
        return self.out_spec.total_dim

    @property
    def need_trans2joint(self) -> bool:
        return ("joints" in self.input_spec.names
                or "verts" in self.input_spec.names)


def init_params(cfg: HumorConfig, key: jax.Array) -> Dict:
    ke, kp, kd = jax.random.split(key, 3)
    params = {
        "encoder": init_mlp(
            ke,
            [cfg.past_data_dim + cfg.input_data_dim] + [MLP_WIDTH] * 4
            + [cfg.latent_size * 2],
        ),
        "decoder": init_mlp(
            kd,
            [cfg.past_data_dim + cfg.latent_size, MLP_WIDTH, MLP_WIDTH, 512,
             cfg.output_data_dim],
            skip_dim=cfg.latent_size,
        ),
    }
    if cfg.conditional_prior:
        params["prior"] = init_mlp(
            kp, [cfg.past_data_dim] + [MLP_WIDTH] * 4 + [cfg.latent_size * 2]
        )
    return params


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Distribution heads
# ---------------------------------------------------------------------------

def posterior(cfg: HumorConfig, params: Dict, past_in: jnp.ndarray,
              t_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q(z | x_{t-1}, x_t): returns (mean, var)."""
    h = mlp_apply(params["encoder"],
                  jnp.concatenate([past_in, t_in], axis=-1),
                  compute_dtype=cfg.compute_dtype)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.exp(logvar)


def prior(cfg: HumorConfig, params: Dict, past_in: jnp.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """p(z | x_{t-1}): returns (mean, var). Standard normal if not conditional."""
    if not cfg.conditional_prior:
        shape = past_in.shape[:-1] + (cfg.latent_size,)
        return jnp.zeros(shape, past_in.dtype), jnp.ones(shape, past_in.dtype)
    h = mlp_apply(params["prior"], past_in,
                  compute_dtype=cfg.compute_dtype)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.exp(logvar)


def rsample(key: jax.Array, mean: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + eps * jnp.sqrt(var)


# ---------------------------------------------------------------------------
# Decoder with residual (delta) composition
# ---------------------------------------------------------------------------

def decode(cfg: HumorConfig, params: Dict, z: jnp.ndarray,
           past_in: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Decode (z, x_{t-1}) -> typed next-state dict with matrix rotations
    (+ raw contact logits). Equivalent to reference decode (:445) followed
    by split_output (:316): the delta composition happens here.
    """
    raw = mlp_apply(params["decoder"], jnp.concatenate([past_in, z], axis=-1),
                    skip_dim=cfg.latent_size,
                    compute_dtype=cfg.compute_dtype)
    out_parts = cfg.out_spec.unpack(raw)

    # most recent input step, typed (static slice of the packed vector —
    # a [-1] index would lower to dynamic_slice, which Pallas TPU kernels
    # tracing this function cannot lower)
    batch_shape = past_in.shape[:-1]
    last_step = past_in[..., (cfg.steps_in - 1) * cfg.input_data_dim:]
    in_parts = cfg.input_spec.unpack(last_step)

    out: Dict[str, jnp.ndarray] = {}
    for name in cfg.out_spec.names:
        val = out_parts[name]
        if name == "contacts":
            out[name] = val  # logits, no residual
            continue
        comp = state_lib.component(name)
        if cfg.output_delta:
            prev = in_parts[name]
            if comp.is_rotation:
                prev_mat = transforms.convert_to_rotmat(prev, cfg.in_rot_rep)
                delta_mat = transforms.convert_to_rotmat(val, cfg.out_rot_rep)
                Rp = prev_mat.reshape(*batch_shape, -1, 3, 3)
                Rd = delta_mat.reshape(*batch_shape, -1, 3, 3)
                out[name] = transforms.rotmat_multiply(Rd, Rp).reshape(
                    *batch_shape, -1)
            else:
                out[name] = val + prev
        else:
            if comp.is_rotation:
                out[name] = transforms.convert_to_rotmat(val, cfg.out_rot_rep)
            else:
                out[name] = val
    return out


# ---------------------------------------------------------------------------
# Single-step training forward
# ---------------------------------------------------------------------------

class StepOutput(NamedTuple):
    pred: Dict[str, jnp.ndarray]          # typed next state (mat rots)
    posterior: Tuple[jnp.ndarray, jnp.ndarray]
    prior: Tuple[jnp.ndarray, jnp.ndarray]
    z: jnp.ndarray


def single_step(cfg: HumorConfig, params: Dict, key: jax.Array,
                past_in: jnp.ndarray, t_in: jnp.ndarray) -> StepOutput:
    """Full training forward: posterior sample -> decode. Reference
    single_step (:374)."""
    qm, qv = posterior(cfg, params, past_in, t_in)
    pm, pv = prior(cfg, params, past_in)
    z = rsample(key, qm, qv)
    pred = decode(cfg, params, z, past_in)
    return StepOutput(pred, (qm, qv), (pm, pv), z)


# ---------------------------------------------------------------------------
# State packing helpers
# ---------------------------------------------------------------------------

def state_to_input(cfg: HumorConfig, state_mat: Dict[str, jnp.ndarray]
                   ) -> jnp.ndarray:
    """Typed state with matrix rotations -> flat network input vector in
    cfg.in_rot_rep (reference converts per-name at humor_model.py:970-980)."""
    parts = []
    for name in cfg.input_spec.names:
        val = state_mat[name]
        comp = state_lib.component(name)
        if comp.is_rotation and cfg.in_rot_rep != "mat":
            batch_shape = val.shape[:-1]
            if cfg.in_rot_rep == "aa":
                R = val.reshape(*batch_shape, -1, 3, 3)
                val = transforms.rotmat_to_aa(R).reshape(*batch_shape, -1)
            elif cfg.in_rot_rep == "6d":
                # first 6 entries of each packed row-major 3x3, matching the
                # reference slicing at humor_model.py:630-634
                val = val.reshape(*batch_shape, -1, 9)[..., :6].reshape(
                    *batch_shape, -1)
        parts.append(val)
    return jnp.concatenate(parts, axis=-1)


def state_to_input_window(cfg: HumorConfig,
                          window: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Typed past window (components (..., S, D), matrix rots, S =
    cfg.steps_in) -> flat frame-major network input (..., S*D_in),
    matching the reference's packing at humor_model.py:997-1001 (concat
    components per frame, then flatten frames)."""
    flat = state_to_input(cfg, window)  # (..., S, D_in)
    return flat.reshape(*flat.shape[:-2], -1)


def _as_window(cfg: HumorConfig,
               state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Normalize an initial state to window layout (B, S, D): accepts
    (B, D) when steps_in == 1 (the common call convention) or (B, S, D)."""
    trans = state["trans"]
    if trans.ndim == 2:
        if cfg.steps_in != 1:
            raise ValueError(
                f"steps_in={cfg.steps_in} needs (B, {cfg.steps_in}, D) "
                "initial states")
        return {k: v[:, None] for k, v in state.items()}
    return dict(state)


def _expand_frame(frame: FrameTransform) -> FrameTransform:
    """(B, ...) frame -> (B, 1, ...) so it broadcasts over a (B, S, D)
    window when re-canonicalizing all past frames at once."""
    return FrameTransform(frame.rot[:, None], frame.trans[:, None],
                          frame.trans2joint[:, None])


def _heading_frame(cfg: HumorConfig, pred: Dict[str, jnp.ndarray],
                   trans2joint: jnp.ndarray) -> FrameTransform:
    """Canonicalizing frame of a predicted (local-world) state."""
    return FrameTransform(
        rot=transforms.compute_world2aligned_mat(
            pred["root_orient"].reshape(*pred["root_orient"].shape[:-1], 3, 3)
        ),
        trans=jnp.concatenate(
            [-pred["trans"][..., :2],
             jnp.zeros_like(pred["trans"][..., :1])], axis=-1),
        trans2joint=trans2joint,
    )


# ---------------------------------------------------------------------------
# Autoregressive rollout (lax.scan)
# ---------------------------------------------------------------------------

class RolloutResult(NamedTuple):
    world: Dict[str, jnp.ndarray]   # each (B, T, D) in the global frame
    z: jnp.ndarray                  # (B, T, latent)
    prior: Tuple[jnp.ndarray, jnp.ndarray]  # means/vars (B, T, latent)


def rollout(
    cfg: HumorConfig,
    params: Dict,
    key: jax.Array,
    init_state: Dict[str, jnp.ndarray],
    num_steps: int,
    use_mean: bool = False,
    z_seq: Optional[jnp.ndarray] = None,
    canonicalize_input: bool = False,
    uncanonicalize_output: bool = False,
    smpl_joint_fn=None,
) -> RolloutResult:
    """Autoregressive generation from an initial typed state (matrix rots,
    steps_in=1 layout: each component (B, D)).

    Equivalent of reference roll_out (:785) as one lax.scan. If
    `canonicalize_input`, the initial state may be in an arbitrary world
    frame; with `uncanonicalize_output` the trajectory is returned in that
    original frame instead of the canonical one.

    `smpl_joint_fn(trans (B,3), root_orient_mat (B,9), pose_body_mat
    (B,J*9)) -> joints (B, 22*3)` enables HuMoR-Qual: the joints fed back
    into the next step come from an SMPL forward on the predicted params
    instead of the decoder's joint output (reference use_smpl_joint_inputs,
    humor_model.py:210-228, 894-940 — there a per-step gender-split torch
    pass; here one where-select LBS inside the scan). As in the reference
    (:894 "output is the actual regressed joints, but input to next step
    can use smpl joints"), the returned world trajectory keeps the
    decoder's regressed joints — only the feedback path is replaced.
    """
    state0 = _as_window(cfg, init_state)  # components (B, S, D)
    B = state0["trans"].shape[0]
    dtype = state0["trans"].dtype

    if canonicalize_input:
        # canonicalize the whole past window into the NEWEST frame's
        # heading frame (reference :804-835; all steps_in frames share it)
        init_frame = frame_from_state({k: v[:, -1]
                                       for k, v in state0.items()})
        local0 = apply_world2local(_expand_frame(init_frame), state0)
    else:
        init_frame = FrameTransform.identity((B,), dtype)
        local0 = state0
    local0 = {k: local0[k] for k in cfg.input_spec.names}

    # trans2joint: constant for the whole rollout (reference :863-865),
    # from the newest past frame
    if cfg.need_trans2joint:
        t2j = jnp.concatenate(
            [-local0["joints"][:, -1, :2],
             jnp.zeros((B, 1), dtype)], axis=-1)
    else:
        t2j = jnp.zeros((B, 3), dtype)

    if uncanonicalize_output and canonicalize_input:
        g_rot0, g_trans0 = init_frame.rot, init_frame.trans
    else:
        g_rot0 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
        g_trans0 = jnp.zeros((B, 3), dtype)

    keys = jax.random.split(key, num_steps)

    def scan_step(carry, inp):
        local_window, g_rot, g_trans = carry   # components (B, S, D)
        step_key, z_in = inp

        past_in = state_to_input_window(cfg, local_window)
        pm, pv = prior(cfg, params, past_in)
        if z_seq is not None:
            z = z_in
        elif use_mean:
            z = pm
        else:
            z = rsample(step_key, pm, pv)
        pred = decode(cfg, params, z, past_in)

        # HuMoR-Qual: the fed-back joints come from SMPL; the *output*
        # keeps the regressed joints (reference :894-940)
        fed = pred
        if smpl_joint_fn is not None and "joints" in pred:
            fed = dict(pred)
            fed["joints"] = smpl_joint_fn(
                pred["trans"], pred["root_orient"], pred["pose_body"])

        # world-frame output under the running global transform
        g_xform = FrameTransform(g_rot, g_trans, t2j)
        world = apply_world2local(g_xform, pred, invert=True)

        # slide the window (drop oldest, append fed-back prediction) and
        # re-canonicalize ALL steps_in frames into the new frame (input
        # components only: contacts are auxiliary outputs, not fed back)
        step_frame = _heading_frame(cfg, fed, t2j)
        window = {k: jnp.concatenate([local_window[k][:, 1:],
                                      fed[k][:, None]], axis=1)
                  for k in cfg.input_spec.names}
        next_local = apply_world2local(_expand_frame(step_frame), window)

        # update global world->local composition (reference :990-992)
        new_g_trans = jnp.concatenate(
            [-world["trans"][..., :2], jnp.zeros((B, 1), dtype)], axis=-1)
        new_g_rot = jnp.matmul(g_rot, step_frame.rot, precision=_HI)

        out = {k: v for k, v in world.items()}
        return (next_local, new_g_rot, new_g_trans), (out, z, pm, pv)

    if z_seq is not None:
        z_steps = jnp.swapaxes(z_seq, 0, 1)  # (T, B, latent)
    else:
        z_steps = jnp.zeros((num_steps, B, cfg.latent_size), dtype)

    # HUMOR_ROLLOUT_UNROLL: scan unroll factor for the per-step body.
    # The steps are tiny (1024-wide MLPs at small B), so loop bookkeeping
    # is a visible fraction; unrolling trades compile time for it.
    import os as _os
    unroll = int(_os.environ.get("HUMOR_ROLLOUT_UNROLL", "1"))
    (_, _, _), (world_seq, z_out, pm_seq, pv_seq) = jax.lax.scan(
        scan_step, (local0, g_rot0, g_trans0), (keys, z_steps),
        unroll=unroll)

    # scan stacks on axis 0 (time); move to (B, T, D)
    world_bt = {k: jnp.swapaxes(v, 0, 1) for k, v in world_seq.items()}
    return RolloutResult(
        world=world_bt,
        z=jnp.swapaxes(z_out, 0, 1),
        prior=(jnp.swapaxes(pm_seq, 0, 1), jnp.swapaxes(pv_seq, 0, 1)),
    )


# ---------------------------------------------------------------------------
# Sequence inference (encode a global sequence into per-step distributions)
# ---------------------------------------------------------------------------

class InferResult(NamedTuple):
    prior: Tuple[jnp.ndarray, jnp.ndarray]      # (B, T-1, latent) mean/var
    posterior: Tuple[jnp.ndarray, jnp.ndarray]  # (B, T-1, latent)


def infer_global_seq(cfg: HumorConfig, params: Dict,
                     global_seq: Dict[str, jnp.ndarray]) -> InferResult:
    """Per-transition prior/posterior over a world-frame sequence
    (components (B, T, D), matrix rotations). Each step pair
    (x_t, x_{t+1}) is canonicalized into x_t's heading frame.

    Equivalent of reference infer_global_seq (:1061) as one scan over
    time. With steps_in = S > 1, each transition's past is the S-frame
    window ending at t, canonicalized into frame t's heading frame, and
    the output covers the T - S transitions t = S-1 .. T-2.
    """
    S = cfg.steps_in
    B, T = global_seq["trans"].shape[:2]
    dtype = global_seq["trans"].dtype

    # trans2joint from the first frame (reference :1090-1092)
    if cfg.need_trans2joint:
        root_xy = global_seq["joints"][:, 0, :2] - global_seq["trans"][:, 0, :2]
        t2j = jnp.concatenate([-root_xy, jnp.zeros((B, 1), dtype)], axis=-1)
    else:
        t2j = jnp.zeros((B, 3), dtype)

    names = list(cfg.input_spec.names)
    n_pairs = T - S
    # past window [:, i, s] = frame i+s; next [:, i] = frame i+S
    pairs_past = {
        k: jnp.swapaxes(jnp.stack(
            [global_seq[k][:, s: s + n_pairs] for s in range(S)], axis=2),
            0, 1)
        for k in names}  # (n_pairs, B, S, D)
    pairs_next = {k: jnp.swapaxes(global_seq[k][:, S:], 0, 1)
                  for k in names}

    def scan_step(_, inp):
        past_w, next_w = inp
        frame = frame_from_state({k: v[:, -1] for k, v in past_w.items()},
                                 trans2joint=t2j)
        past_l = apply_world2local(_expand_frame(frame), past_w)
        next_l = apply_world2local(frame, next_w)
        past_in = state_to_input_window(cfg, past_l)
        t_in = state_to_input(cfg, next_l)
        qm, qv = posterior(cfg, params, past_in, t_in)
        pm, pv = prior(cfg, params, past_in)
        return None, (pm, pv, qm, qv)

    _, (pm, pv, qm, qv) = jax.lax.scan(scan_step, None,
                                       (pairs_past, pairs_next))
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    return InferResult(prior=(swap(pm), swap(pv)),
                       posterior=(swap(qm), swap(qv)))


# ---------------------------------------------------------------------------
# Scheduled sampling (training-time autoregressive curriculum)
# ---------------------------------------------------------------------------

class SchedSampOutput(NamedTuple):
    pred: Dict[str, jnp.ndarray]                 # local-frame preds (B,T,D)
    posterior: Tuple[jnp.ndarray, jnp.ndarray]   # (B,T,latent)
    prior: Tuple[jnp.ndarray, jnp.ndarray]


def scheduled_sampling(
    cfg: HumorConfig,
    params: Dict,
    key: jax.Array,
    x_past_seq: jnp.ndarray,   # (B, T, D_in) GT canonical inputs
    x_t_seq: jnp.ndarray,      # (B, T, D_in) GT canonical outputs
    init_state: Dict[str, jnp.ndarray],  # typed (B, D), matrix rots
    use_gt_p: float,
    smpl_joint_fn=None,
) -> SchedSampOutput:
    """Teacher-forcing curriculum: at each step, use the GT input with
    probability `use_gt_p`, else the model's own previous prediction,
    re-canonicalized. Predictions are detached (stop_gradient) before being
    fed back, matching detach_sched_samp=True (reference :500-694).

    One lax.scan; the per-step Bernoulli draw is shared across the batch
    like the reference's single np.random draw per step.

    `smpl_joint_fn` (same signature as rollout's) enables HuMoR-Qual
    TRAINING: the fed-back joints come from an SMPL forward on the
    predicted params (reference :536-592); the loss still sees the
    regressed joints.

    With steps_in = S > 1, x_past_seq is (B, T, S*D_in) (frame-major
    windows) and init_state components are (B, S, D).
    """
    init_state = _as_window(cfg, init_state)
    B, T, _ = x_past_seq.shape
    dtype = x_past_seq.dtype

    if cfg.need_trans2joint:
        t2j = jnp.concatenate(
            [-init_state["joints"][:, -1, :2], jnp.zeros((B, 1), dtype)],
            axis=-1)
    else:
        t2j = jnp.zeros((B, 3), dtype)

    key, choice_key = jax.random.split(key)
    step_keys = jax.random.split(key, T)
    # use_gt[t] decides the input to step t; step 0 always uses GT
    use_gt = jax.random.bernoulli(choice_key, use_gt_p, (T,))
    use_gt = use_gt.at[0].set(True)

    gt_past_seq = jnp.swapaxes(x_past_seq, 0, 1)  # (T, B, D)
    gt_t_seq = jnp.swapaxes(x_t_seq, 0, 1)

    local0 = {k: v for k, v in init_state.items()
              if k in cfg.input_spec.names}

    def scan_step(carry, inp):
        local_window = carry  # typed dict (B, S, D) — own canonical input
        step_key, gt_past, gt_t, take_gt = inp

        own_past = state_to_input_window(cfg, local_window)
        past_in = jnp.where(take_gt, gt_past, own_past)

        out = single_step(cfg, params, step_key, past_in, gt_t)
        pred = out.pred

        fed_back = pred
        if smpl_joint_fn is not None and "joints" in pred:
            fed_back = dict(pred)
            fed_back["joints"] = smpl_joint_fn(
                pred["trans"], pred["root_orient"], pred["pose_body"])
        if cfg.detach_sched_samp:
            fed_back = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                              fed_back)

        # slide the window + re-canonicalize all steps_in frames
        step_frame = _heading_frame(cfg, fed_back, t2j)
        window = {k: jnp.concatenate([local_window[k][:, 1:],
                                      fed_back[k][:, None]], axis=1)
                  for k in cfg.input_spec.names}
        next_local = apply_world2local(_expand_frame(step_frame), window)

        ys = (pred, out.posterior[0], out.posterior[1],
              out.prior[0], out.prior[1])
        return next_local, ys

    _, (pred_seq, qm, qv, pm, pv) = jax.lax.scan(
        scan_step, local0, (step_keys, gt_past_seq, gt_t_seq, use_gt))

    swap = lambda a: jnp.swapaxes(a, 0, 1)
    pred_bt = {k: swap(v) for k, v in pred_seq.items()}
    return SchedSampOutput(pred=pred_bt,
                           posterior=(swap(qm), swap(qv)),
                           prior=(swap(pm), swap(pv)))
