"""HuMoR model evaluation runtimes: test losses, generative sampling,
encode-decode reconstruction.

Behavioral parity target: /root/reference/humor/test/test_humor.py
(--eval-test :119-150, --eval-sampling :170-239, --eval-recon :241-338
including the +5 m world-translation canonicalization probe :284-286).

TPU-first: sampling and reconstruction are single jitted scan programs;
the +5 m probe is a first-class API (`recon_error`) usable as a numeric
invariance check, not just a visual one.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.losses.elbo import LossConfig
from humor_tpu.models import humor as H
from humor_tpu.train import step as TS


def eval_test(model_cfg: H.HumorConfig, loss_cfg: LossConfig, params,
              batches: Iterable[Dict], key: jax.Array,
              smpl_models: Optional[Dict] = None) -> Dict[str, float]:
    """Mean single-step losses over a test set (reference --eval-test)."""
    _, _, eval_step = TS.make_train_steps(
        model_cfg, loss_cfg, TS.make_optimizer(), smpl_models)
    sums: Dict[str, float] = {}
    n = 0
    for batch in batches:
        key, k = jax.random.split(key)
        stats = eval_step(params, batch, k, 0)
        for name, v in stats.items():
            sums[name] = sums.get(name, 0.0) + float(np.asarray(v))
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}


def sample_motion(model_cfg: H.HumorConfig, params, key: jax.Array,
                  init_state: Dict[str, jnp.ndarray], num_steps: int,
                  use_mean: bool = False,
                  smpl_joint_fn=None) -> Dict[str, jnp.ndarray]:
    """Generate motion from initial states (reference eval_sampling
    :170-239): one jitted scan rollout, world-frame outputs (B, T, D).
    Pass smpl_joint_fn (body_model.gendered.make_rollout_joint_fn) for
    HuMoR-Qual SMPL-joint feedback."""
    roll = jax.jit(
        lambda p, k, s: H.rollout(model_cfg, p, k, s, num_steps,
                                  use_mean=use_mean,
                                  canonicalize_input=True,
                                  uncanonicalize_output=True,
                                  smpl_joint_fn=smpl_joint_fn),
        static_argnames=())(params, key, init_state)
    return roll.world


def reconstruct(model_cfg: H.HumorConfig, params,
                global_seq: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
    """Encode a world-frame sequence to posterior means, decode it back by
    rollout (reference eval_recon :241-338). Components (B, T, D); output
    covers frames 1..T-1 in the original world frame."""
    infer = H.infer_global_seq(model_cfg, params, global_seq)
    z = infer.posterior[0]  # (B, T-1, latent)
    init_state = {k: v[:, 0] for k, v in global_seq.items()
                  if k in model_cfg.input_spec.names}
    roll = H.rollout(model_cfg, params, jax.random.PRNGKey(0), init_state,
                     z.shape[1], z_seq=z, canonicalize_input=True,
                     uncanonicalize_output=True)
    return roll.world


def recon_error(model_cfg: H.HumorConfig, params,
                global_seq: Dict[str, jnp.ndarray],
                translate: float = 0.0) -> Dict[str, float]:
    """Reconstruction errors, optionally under a world translation of the
    whole sequence — the reference's +5 m canonicalization probe
    (test_humor.py:284-286) as a numeric check: errors must be invariant
    to `translate`."""
    seq = dict(global_seq)
    if translate != 0.0:
        offset = jnp.asarray([translate, translate, 0.0])
        seq["trans"] = seq["trans"] + offset
        B, T = seq["joints"].shape[:2]
        seq["joints"] = (seq["joints"].reshape(B, T, -1, 3)
                         + offset).reshape(B, T, -1)
        if "verts" in seq:
            seq["verts"] = (seq["verts"].reshape(B, T, -1, 3)
                            + offset).reshape(B, T, -1)

    recon = reconstruct(model_cfg, params, seq)
    out = {}
    for name in ("trans", "joints", "pose_body"):
        if name in recon:
            gt = seq[name][:, 1:]
            err = jnp.sqrt(jnp.mean(jnp.square(recon[name] - gt)))
            out[name] = float(err)
    return out
