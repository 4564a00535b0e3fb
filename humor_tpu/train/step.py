"""Jitted training/eval steps for the HuMoR CVAE.

Behavioral parity target: the module-level step() at
/root/reference/humor/models/humor_model.py:32-99 and the loop body of
/root/reference/humor/train/train_humor.py:191-241.

TPU-first design:
  * supervised phase flattens (B, T) transitions into one batch — a pure
    reshape feeding one big MXU-friendly MLP batch (same trick as the
    reference, :54-60);
  * scheduled-sampling phase is the scan in models.humor;
  * two separately-jitted steps (the two phases are different graphs);
    `epoch` and `use_gt_p` are traced scalars so the curriculum never
    recompiles;
  * non-finite gradients are skipped on-device (optax.apply_if_finite)
    instead of the reference's host-side NaN check (:199-211);
  * data parallelism = batch-axis sharding constraints over the `dp` mesh;
    XLA inserts the psum for the grad all-reduce.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from humor_tpu.losses.elbo import LossConfig, elbo_loss
from humor_tpu.models import humor as H


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4,
                   milestones=(50, 80, 140),
                   decays=(0.5, 0.2, 0.4),
                   steps_per_epoch: int = 1,
                   optim: str = "adamax",
                   grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    """Adamax + MultiStepLR equivalent (reference train_humor.py:85-97,114)."""
    sched = optax.piecewise_constant_schedule(
        lr, {int(m) * steps_per_epoch: d for m, d in zip(milestones, decays)})
    base = optax.adamax if optim == "adamax" else optax.adam
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(base(sched))
    # skip non-finite updates instead of crashing (reference NaN-grad skip)
    return optax.apply_if_finite(optax.chain(*chain), max_consecutive_errors=10**6)


def init_train_state(cfg: H.HumorConfig, opt: optax.GradientTransformation,
                     key: jax.Array) -> TrainState:
    params = H.init_params(cfg, key)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def _flatten_supervised(cfg: H.HumorConfig, batch: Dict) -> Tuple:
    """(B, T, D) typed dicts -> flat (B*T, ...) network inputs + gt.
    With steps_in = S > 1, data_in components are (B, T, S, D) windows
    (data.windows.window_to_pairs_multi layout)."""
    data_in, data_out = batch["data_in"], batch["data_out"]
    B, T = data_in["trans"].shape[:2]
    flat_out = {k: v.reshape(B * T, -1) for k, v in data_out.items()}
    if cfg.steps_in == 1:
        flat_in = {k: v.reshape(B * T, -1) for k, v in data_in.items()}
        past = H.state_to_input(cfg, flat_in)
    else:
        S = cfg.steps_in
        flat_in = {k: v.reshape(B * T, S, -1) for k, v in data_in.items()}
        past = H.state_to_input_window(cfg, flat_in)
    t_in = H.state_to_input(cfg, flat_out)
    gender = jnp.repeat(batch["gender_ids"], T, axis=0)
    betas = jnp.repeat(batch["betas"], T, axis=0)
    return past, t_in, flat_out, gender, betas


def supervised_loss_fn(cfg: H.HumorConfig, loss_cfg: LossConfig,
                       smpl_models: Optional[Dict]):
    """Loss for the fully-supervised phase (every step teacher-forced)."""

    def fn(params, batch, key, epoch):
        past, t_in, gt, gender, betas = _flatten_supervised(cfg, batch)
        out = H.single_step(cfg, params, key, past, t_in)
        return elbo_loss(loss_cfg, out.pred, out.posterior, out.prior, gt,
                         epoch, gender_ids=gender, betas=betas,
                         smpl_models=smpl_models)

    return fn


def sched_samp_loss_fn(cfg: H.HumorConfig, loss_cfg: LossConfig,
                       smpl_models: Optional[Dict],
                       use_smpl_joint_inputs: bool = False):
    """Loss for the scheduled-sampling phase: roll predictions forward with
    probability (1 - use_gt_p) per step, supervise each local step.

    `use_smpl_joint_inputs` is the HuMoR-Qual TRAINING path (reference
    humor_model.py:510-592, configs/train_humor_qual.cfg): the joints fed
    back into the next step come from a gendered SMPL forward on the
    predicted params (the loss still supervises the regressed joints)."""
    if use_smpl_joint_inputs and smpl_models is None:
        raise ValueError("use_smpl_joint_inputs requires smpl_models")

    def fn(params, batch, key, epoch, use_gt_p):
        data_in, data_out = batch["data_in"], batch["data_out"]
        B, T = data_in["trans"].shape[:2]
        if cfg.steps_in == 1:
            x_past = H.state_to_input(cfg, data_in)   # (B, T, D_in)
        else:
            x_past = H.state_to_input_window(cfg, data_in)  # (B,T,S*D)
        # components (B, D) for steps_in=1, (B, S, D) otherwise
        init_state = {k: v[:, 0] for k, v in data_in.items()}
        x_t = H.state_to_input(cfg, data_out)
        joint_fn = None
        if use_smpl_joint_inputs:
            from humor_tpu.body_model.gendered import make_rollout_joint_fn
            joint_fn = make_rollout_joint_fn(
                smpl_models, batch["gender_ids"], batch["betas"])
        out = H.scheduled_sampling(cfg, params, key, x_past, x_t, init_state,
                                   use_gt_p, smpl_joint_fn=joint_fn)
        flat_pred = {k: v.reshape(B * T, -1) for k, v in out.pred.items()}
        gt = {k: v.reshape(B * T, -1) for k, v in data_out.items()}
        post = tuple(v.reshape(B * T, -1) for v in out.posterior)
        pri = tuple(v.reshape(B * T, -1) for v in out.prior)
        gender = jnp.repeat(batch["gender_ids"], T, axis=0)
        betas = jnp.repeat(batch["betas"], T, axis=0)
        return elbo_loss(loss_cfg, flat_pred, post, pri, gt, epoch,
                         gender_ids=gender, betas=betas,
                         smpl_models=smpl_models)

    return fn


def make_train_steps(cfg: H.HumorConfig, loss_cfg: LossConfig,
                     opt: optax.GradientTransformation,
                     smpl_models: Optional[Dict] = None,
                     mesh=None, batch_axis: str = "dp",
                     use_smpl_joint_inputs: bool = False):
    """Build (supervised_step, sched_samp_step, eval_step), each jitted.

    With a mesh, batch pytrees get a leading-axis sharding constraint and
    params stay replicated — XLA turns the grad reduction into a psum over
    ICI. `use_smpl_joint_inputs` enables HuMoR-Qual training (SMPL-joint
    feedback in the sched-samp phase).
    """
    sup_loss = supervised_loss_fn(cfg, loss_cfg, smpl_models)
    ss_loss = sched_samp_loss_fn(cfg, loss_cfg, smpl_models,
                                 use_smpl_joint_inputs=use_smpl_joint_inputs)

    def constrain(batch):
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(batch_axis))
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, sh)
            if hasattr(x, "ndim") and x.ndim > 0 else x, batch)

    def _update(state, grads, loss, stats):
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        stats = dict(stats)
        stats["total_loss"] = loss
        stats["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_opt, state.step + 1), stats

    @jax.jit
    def supervised_step(state: TrainState, batch, key, epoch):
        batch = constrain(batch)
        (loss, stats), grads = jax.value_and_grad(sup_loss, has_aux=True)(
            state.params, batch, key, epoch)
        return _update(state, grads, loss, stats)

    @jax.jit
    def sched_samp_step(state: TrainState, batch, key, epoch, use_gt_p):
        batch = constrain(batch)
        (loss, stats), grads = jax.value_and_grad(ss_loss, has_aux=True)(
            state.params, batch, key, epoch, use_gt_p)
        return _update(state, grads, loss, stats)

    @jax.jit
    def eval_step(params, batch, key, epoch):
        batch = constrain(batch)
        loss, stats = sup_loss(params, batch, key, epoch)
        stats = dict(stats)
        stats["total_loss"] = loss
        return stats

    return supervised_step, sched_samp_step, eval_step


def make_multi_steps(sup_step, ss_step, k: int):
    """Dispatch-amortized training: `lax.scan` k steps over a stacked
    batch pytree (leading axis k) in ONE device program.

    The measured single-chip step is ~32-44 ms fixed (remote dispatch +
    host work) + compute (RESULTS.md "Training throughput"), so at the
    reference config roughly half of every 78 ms step is overhead that
    k-step scanning amortizes to ~1/k. Steps stay IDENTICAL to the
    single-step path (same jitted bodies scanned, same optimizer state
    threading, same per-step key folding) — multi(k) == k singles up to
    fp-reassociation (pinned by tests/test_train_multi.py).

    Returns (multi_sup, multi_ss):
      multi_sup(state, batches_k, key, epoch) -> (state, stats_k)
      multi_ss(state, batches_k, key, epoch, use_gt_p) -> (state, stats_k)
    where stats_k leaves have a leading k axis (callers reduce for
    logging). Keys are jax.random.split(key, k); epoch/use_gt_p are
    traced scalars shared across the k steps, matching the trainer's
    per-epoch curriculum granularity.
    """

    def _scan(step_fn, extra):
        def body(state, xs):
            batch, key_i = xs
            new_state, stats = step_fn(state, batch, key_i, *extra)
            return new_state, stats
        return body

    @partial(jax.jit, donate_argnums=(0,))
    def multi_sup(state, batches, key, epoch):
        keys = jax.random.split(key, k)
        return jax.lax.scan(_scan(sup_step, (epoch,)), state,
                            (batches, keys))

    @partial(jax.jit, donate_argnums=(0,))
    def multi_ss(state, batches, key, epoch, use_gt_p):
        keys = jax.random.split(key, k)
        return jax.lax.scan(_scan(ss_step, (epoch, use_gt_p)), state,
                            (batches, keys))

    return multi_sup, multi_ss


def stack_batches(batches):
    """Stack a list of batch pytrees along a new leading axis (the scan
    axis for make_multi_steps). Device arrays stack on device (jnp.stack
    — a host round-trip here would pay a device->host readback of every
    leaf plus a re-upload over the tunneled link); host leaves stack with
    numpy so the stacked array transfers once."""
    import numpy as np

    def _stack(*xs):
        if isinstance(xs[0], jax.Array):
            return jnp.stack(xs)
        return np.stack([np.asarray(x) for x in xs])

    return jax.tree_util.tree_map(_stack, *batches)


def sched_samp_prob(epoch: int, start: int, end: int) -> float:
    """GT-input probability curriculum (reference train_humor.py:167-185):
    1.0 before `start`, linear decay to 0.0 at `end`, 0.0 after."""
    if epoch < start:
        return 1.0
    if end <= start or epoch >= end:
        return 0.0
    return 1.0 - (epoch - start) / float(end - start)
