"""Training CLI: `python -m humor_tpu.train.cli @configs/train_humor.cfg`.

Behavioral parity target: /root/reference/humor/train/train_humor.py
(dynamic class loading replaced by typed configs; same curriculum,
checkpointing, and logging behavior via humor_tpu.train.trainer).
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional

import numpy as np


def build_dataset(cfg, datasets, fallback_seed=0, default_names=None):
    """Processed-npz dataset if data exists, else synthetic (so the CLI is
    runnable without licensed AMASS data).

    default_names: the HuMoR paper split for this role (data/amass.py
    TRAIN/VAL/TEST_DATASETS), used when `datasets` is empty — the
    reference's split_by='dataset' defaults (amass_discrete_dataset.py:
    148-152). If the default split names match nothing (custom data
    layouts), all processed files are used instead."""
    from humor_tpu.data.dataset import AmassDataset, find_processed_files

    names = list(datasets) if datasets else list(default_names or ())
    paths = find_processed_files(cfg.data_path, names or None)
    if not paths and names and not datasets:
        paths = find_processed_files(cfg.data_path, None)
    if paths:
        return AmassDataset.from_npz_files(paths)
    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.data import amass as A

    print(f"[train] no processed data under {cfg.data_path!r}; "
          "using synthetic sequences")
    model = synthetic_smpl_model()
    rng = np.random.RandomState(fallback_seed)
    seqs = []
    for i in range(8):
        raw = {
            "fps": np.asarray(60.0),
            "gender": ["male", "female"][i % 2],
            "trans": np.cumsum(rng.randn(400, 3) * 0.01, axis=0),
            "root_orient": rng.randn(400, 3) * 0.2,
            "pose_body": rng.randn(400, 63) * 0.1,
            "betas": rng.randn(16) * 0.3,
        }
        seq = A.process_sequence(model, raw, discard_terrain=False)
        if seq is not None:
            seqs.append(seq)
    return AmassDataset.from_processed(seqs)


def load_body_models(smplh_root: str) -> Optional[Dict]:
    """Gendered SMPL+H models if the licensed assets exist, else synthetic
    stand-ins (tests / CI)."""
    import jax

    from humor_tpu.body_model import smpl as S

    out = {}
    for gender in ("male", "female"):
        path = S.find_model_path(smplh_root, gender)
        if os.path.exists(path):
            out[gender] = S.load_smpl_npz(path)
    if len(out) == 2:
        return out
    return {
        "male": S.synthetic_smpl_model(jax.random.PRNGKey(10)),
        "female": S.synthetic_smpl_model(jax.random.PRNGKey(20)),
    }


def make_batch_fn(dataset, cfg, window_frames: int, steps: int, seed: int,
                  budget_bytes: Optional[int] = None):
    """-> train_batches(epoch) generator factory (see make_batch_fns)."""
    return make_batch_fns(dataset, cfg, window_frames, steps, seed,
                          budget_bytes=budget_bytes)[0]


def make_batch_fns(dataset, cfg, window_frames: int, steps: int, seed: int,
                   budget_bytes: Optional[int] = None):
    """-> (train_batches(epoch), train_chunks(epoch, k) | None), sharing
    one staged device store.

    Two data paths (identical values at noise_std=0, pinned by
    tests/test_device_store.py):
      * device-resident store (default when it fits the HBM budget):
        the packed store is staged once and each batch moves only the
        sampled window indices before an on-device gather+canonicalize
        (humor_tpu.data.device_store) — removes the per-batch bulk
        transfer from the step loop entirely. train_chunks additionally
        fuses each k-step dispatch group into ONE gather program
        (sample_window_chunk), replacing ~4k small dispatches per chunk
        with one; per-step seeds match train_batches, so a chunk equals
        the corresponding k batches stacked.
      * host gather + per-batch transfer + device canonicalization
        (--data-on-device 0, or stores past the budget); train_chunks
        is None and the Trainer stacks per-batch items itself.
    """
    import jax
    import jax.numpy as jnp

    from functools import partial

    from humor_tpu.data.device_store import DEFAULT_BUDGET_BYTES, maybe_stage
    from humor_tpu.data.windows import window_to_pairs, window_to_pairs_multi

    steps_in = getattr(cfg, "model_steps_in", 1)
    if steps_in == 1:
        to_pairs = jax.jit(window_to_pairs)
    else:
        multi = jax.jit(partial(window_to_pairs_multi, steps_in=steps_in))
        to_pairs = lambda w: multi(w) + (None,)
    keep = ("trans", "trans_vel", "root_orient", "root_orient_vel",
            "pose_body", "joints", "joints_vel", "contacts")
    dev_store = maybe_stage(dataset,
                            getattr(cfg, "data_on_device", -1),
                            columns=keep,
                            budget_bytes=(DEFAULT_BUDGET_BYTES
                                          if budget_bytes is None
                                          else budget_bytes))

    def batches(epoch: int):
        for i in range(steps):
            s = seed + epoch * 100003 + i
            if dev_store is not None:
                world, meta = dev_store.sample_windows(
                    s, cfg.batch_size, window_frames,
                    noise_std=cfg.data_noise_std)
                data_in, data_out, _ = to_pairs(world)
                yield {"data_in": data_in, "data_out": data_out,
                       "betas": meta["betas"],
                       "gender_ids": meta["gender_ids"]}
                continue
            world_np, meta = dataset.sample_windows(
                s, cfg.batch_size, window_frames,
                noise_std=cfg.data_noise_std)
            # unpack_frames returns strided views into the packed frame
            # buffer; transferring those costs ~2.6x a contiguous copy
            # over the device link (RESULTS.md "Training throughput",
            # host-pipeline breakdown) — repack on host first
            world = {k: jnp.asarray(np.ascontiguousarray(world_np[k]))
                     for k in keep}
            data_in, data_out, _ = to_pairs(world)
            yield {
                "data_in": data_in,
                "data_out": data_out,
                "betas": jnp.asarray(meta["betas"]),
                "gender_ids": jnp.asarray(meta["gender_ids"] % 2),
            }

    if dev_store is None:
        return batches, None

    def _device_batch(s: int):
        world, meta = dev_store.sample_windows(
            s, cfg.batch_size, window_frames,
            noise_std=cfg.data_noise_std)
        data_in, data_out, _ = to_pairs(world)
        return {"data_in": data_in, "data_out": data_out,
                "betas": meta["betas"], "gender_ids": meta["gender_ids"]}

    def chunks(epoch: int, k: int):
        i = 0
        while i < steps:
            n = min(k, steps - i)
            seeds = [seed + epoch * 100003 + i + j for j in range(n)]
            if n == k:
                world, meta = dev_store.sample_window_chunk(
                    seeds, cfg.batch_size, window_frames,
                    noise_std=cfg.data_noise_std)
                data_in, data_out, _ = to_pairs(world)
                yield ({"data_in": data_in, "data_out": data_out,
                        "betas": meta["betas"],
                        "gender_ids": meta["gender_ids"]}, k)
            else:
                for s in seeds:
                    yield (_device_batch(s), 1)
            i += n

    return batches, chunks


def main(argv=None) -> Dict[str, float]:
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.models import humor as H
    from humor_tpu.train.trainer import TrainRunConfig, Trainer
    from humor_tpu.utils.config import TrainCLIConfig, parse_into

    cfg = parse_into(TrainCLIConfig, argv, prog="humor-train")

    model_cfg = H.HumorConfig(
        latent_size=cfg.latent_size, in_rot_rep=cfg.in_rot_rep,
        out_rot_rep=cfg.out_rot_rep,
        model_data_config=cfg.model_data_config,
        conditional_prior=cfg.conditional_prior,
        output_delta=cfg.output_delta,
        steps_in=cfg.model_steps_in,
        compute_dtype=cfg.model_compute_dtype or None)
    loss_cfg = LossConfig(
        kl_loss=cfg.kl_loss,
        kl_loss_anneal_start=cfg.kl_loss_anneal_start,
        kl_loss_anneal_end=cfg.kl_loss_anneal_end,
        contacts_loss=cfg.contacts_loss,
        contacts_vel_loss=cfg.contacts_vel_loss,
        smpl_joint_loss=cfg.smpl_joint_loss if cfg.use_smpl_losses else 0.0,
        smpl_mesh_loss=cfg.smpl_mesh_loss if cfg.use_smpl_losses else 0.0,
        smpl_joint_consistency_loss=(
            cfg.smpl_joint_consistency_loss if cfg.use_smpl_losses else 0.0))
    run_cfg = TrainRunConfig(
        out_dir=cfg.out, epochs=cfg.epochs, lr=cfg.lr,
        sched_milestones=tuple(cfg.sched_milestones),
        sched_decays=tuple(cfg.sched_decays),
        sched_samp_start=cfg.sched_samp_start,
        sched_samp_end=cfg.sched_samp_end, val_every=cfg.val_every,
        save_every=cfg.save_every, print_every=cfg.print_every,
        resume_ckpt=cfg.ckpt or None, load_optim=not cfg.no_load_optim,
        use_smpl_joint_inputs=cfg.model_use_smpl_joint_inputs,
        steps_per_dispatch=cfg.steps_per_dispatch,
        prefetch_depth=cfg.prefetch_depth)

    from humor_tpu.data import amass as A

    train_ds = build_dataset(cfg, cfg.train_datasets,
                             default_names=A.TRAIN_DATASETS)
    # validation always runs (reference train_humor.py:248-299);
    # cfg.val_datasets narrows which datasets feed it (empty = the HuMoR
    # paper val split, falling back to all for custom layouts)
    val_ds = build_dataset(cfg, cfg.val_datasets, fallback_seed=1,
                           default_names=A.VAL_DATASETS)
    # need sample_num_frames transitions + steps_in past frames
    window = cfg.sample_num_frames + cfg.model_steps_in
    # HuMoR-Qual training needs the body models even with SMPL losses off
    smpl_models = load_body_models(cfg.smplh_root) \
        if cfg.use_smpl_losses or cfg.model_use_smpl_joint_inputs else None

    train_batches, train_chunks = make_batch_fns(
        train_ds, cfg, window, cfg.steps_per_epoch, cfg.seed)
    # the train and val stores share one HBM budget: the val store only
    # auto-stages into what the train store left (forcing with
    # --data-on-device 1 still stages both)
    from humor_tpu.data.device_store import (DEFAULT_BUDGET_BYTES,
                                             DeviceWindowStore)
    used = (DeviceWindowStore.staged_nbytes(train_ds)
            if train_chunks is not None else 0)
    trainer = Trainer(
        model_cfg, loss_cfg, run_cfg,
        train_batches=train_batches,
        train_chunks=train_chunks,
        val_batches=make_batch_fn(val_ds, cfg, window,
                                  max(1, cfg.steps_per_epoch // 10),
                                  cfg.seed + 7,
                                  budget_bytes=max(
                                      0, DEFAULT_BUDGET_BYTES - used)),
        steps_per_epoch=cfg.steps_per_epoch,
        smpl_models=smpl_models, seed=cfg.seed)
    return trainer.fit()


if __name__ == "__main__":
    from humor_tpu.utils.platform import setup_platform

    setup_platform()
    main()
