"""Reusable in-env model fixtures: quickly-trained mini HuMoR / VPoser on
the procedural synthetic-AMASS generator.

Used by tests/test_tto_accuracy.py (the synthetic-GT recovery bound — the
in-env proxy for the driver baseline's "wall-clock at MPJPE parity"
clause) and benchmarks/bench_knee.py (the accuracy-vs-effort sweep that
locates the iteration-budget knee). Shared here so the bench measures the
exact model the accuracy test asserts about.

Why trained models: with random-init networks the stage-3 latent rollout
cannot represent arbitrary motion and L-BFGS cannot usefully invert a
random 4x1024 MLP — TTO accuracy statements are only well-posed against a
(briefly) trained prior, exactly as in the reference, whose released
checkpoints cannot ship in this env (reference motion_optimizer.py:202-676).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def train_mini_humor(model, cfg, sup_steps: int = 300,
                     ss_steps: int = 150, batch: int = 48,
                     frames: int = 10, ss_len: int = 10) -> Dict:
    """~2.5 min CPU curriculum (seconds on the chip): supervised +
    scheduled-sampling steps with the full SMPL losses — enough for the
    posterior to approximately invert the decoder and for rollouts to
    track the synthetic manifold."""
    import jax

    from humor_tpu.data.synthetic import synthetic_world_batch
    from humor_tpu.data.windows import window_to_pairs
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.train import step as TS

    opt = TS.make_optimizer(lr=5e-4, steps_per_epoch=50)
    state = TS.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    sup, ss, _ = TS.make_train_steps(cfg, LossConfig(), opt,
                                     {"male": model, "female": model})
    key = jax.random.PRNGKey(1)

    def make_batch(seed, nframes):
        world, meta = synthetic_world_batch(seed, batch, nframes + 1,
                                            model=model)
        data_in, data_out, _ = window_to_pairs(world)
        return {"data_in": data_in, "data_out": data_out,
                "betas": meta["betas"], "gender_ids": meta["gender_ids"]}

    batches = [make_batch(s, frames) for s in range(40)]
    for i in range(sup_steps):
        state, _ = sup(state, batches[i % 40], jax.random.fold_in(key, i),
                       min(i // 60, 5))
    # scheduled sampling on LONGER windows: the SS rollout horizon is the
    # window length, and rollout stability at the TTO's stage-3 horizon
    # (59 steps for 60-frame fits) is set by the horizon trained here,
    # not by more supervised steps
    ss_batches = (batches if ss_len == frames else
                  [make_batch(100 + s, ss_len) for s in range(20)])
    for i in range(ss_steps):
        p_gt = max(0.0, 1.0 - i / 100.0)
        state, _ = ss(state, ss_batches[(i * 7) % len(ss_batches)],
                      jax.random.fold_in(key, 10_000 + i), 15, p_gt)
    return state.params


def train_mini_vposer(model, hidden: int = 96, steps: int = 800,
                      n_seqs: int = 64) -> Tuple:
    """Mini VPoser autoencoding the synthetic pose distribution (~10 s).
    Returns (vposer_cfg, vposer_params).

    hidden/steps/n_seqs size the fixture's pose-reconstruction floor: the
    TTO routes ALL body pose through latent2pose, so the VPoser
    round-trip MAE lower-bounds every stage-2/3 MPJPE (the default
    96/800 fixture measured 0.1675 rad on GT poses — bench_knee.py
    prints the number so accuracy results stay attributable)."""
    import jax
    import jax.numpy as jnp
    import optax

    from humor_tpu.data.synthetic import synthetic_world_batch
    from humor_tpu.models import vposer as vp
    from humor_tpu.ops import transforms

    vcfg = vp.VPoserConfig(hidden=hidden)
    vparams = vp.init_params(vcfg, jax.random.PRNGKey(3))
    world, _ = synthetic_world_batch(100, n_seqs, 20, model=model)
    poses = np.asarray(transforms.rotmat_to_aa(jnp.asarray(
        np.asarray(world["pose_body"]).reshape(-1, 21, 3, 3)))
    ).reshape(-1, 63)
    vopt = optax.adam(2e-3)
    ostate = vopt.init(vparams)

    @jax.jit
    def vstep(params, ostate, batch):
        def loss_fn(p):
            mu, std = vp.encode(vcfg, p, batch)
            rec = vp.latent2pose(vcfg, p, mu)
            kl = 0.5 * jnp.mean(mu ** 2 + std ** 2
                                - 2 * jnp.log(std + 1e-8) - 1)
            return jnp.mean(jnp.square(rec - batch)) + 1e-3 * kl
        l, g = jax.value_and_grad(loss_fn)(params)
        up, o2 = vopt.update(g, ostate, params)
        return optax.apply_updates(params, up), o2, l

    rng = np.random.RandomState(0)
    for _ in range(steps):
        idx = rng.choice(poses.shape[0], 256, replace=False)
        vparams, ostate, _ = vstep(vparams, ostate,
                                   jnp.asarray(poses[idx]))
    return vcfg, vparams


def trained_tto_models(sup_steps: int = 300, ss_steps: int = 150,
                       ss_len: int = 10, cache: str = None,
                       vp_hidden: int = 96, vp_steps: int = 800,
                       vp_seqs: int = 64):
    """TTOModels bundle with the briefly-trained mini HuMoR + VPoser over
    the procedural synthetic body.

    cache: optional .npz path — load the trained params from it when it
    exists, train-and-save otherwise (benches re-enter this fixture many
    times; training costs minutes per entry).

    vp_*: fixture-VPoser capacity (see train_mini_vposer — the pose
    round-trip floor caps measurable TTO accuracy)."""
    import jax

    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.fitting.optimizer import TTOModels
    from humor_tpu.models import humor as H
    from humor_tpu.models import vposer as vp
    from humor_tpu.utils import checkpoint as ckpt

    model = synthetic_smpl_model()
    cfg = H.HumorConfig()
    vcfg = vp.VPoserConfig(hidden=vp_hidden)
    import os
    if cache and os.path.exists(cache):
        tmpl = {"humor": H.init_params(cfg, jax.random.PRNGKey(0)),
                "vposer": vp.init_params(vcfg, jax.random.PRNGKey(3))}
        both = ckpt.load_state(cache, tmpl)["params"]
        return TTOModels(body=model, vposer_cfg=vcfg,
                         vposer=both["vposer"], humor_cfg=cfg,
                         humor=both["humor"], init_gmm=None)
    humor_params = train_mini_humor(model, cfg, sup_steps=sup_steps,
                                    ss_steps=ss_steps, ss_len=ss_len)
    vcfg2, vparams = train_mini_vposer(model, hidden=vp_hidden,
                                       steps=vp_steps, n_seqs=vp_seqs)
    assert vcfg2 == vcfg
    if cache:
        ckpt.save_state(cache, {"humor": humor_params, "vposer": vparams})
    return TTOModels(body=model, vposer_cfg=vcfg, vposer=vparams,
                     humor_cfg=cfg, humor=humor_params, init_gmm=None)
