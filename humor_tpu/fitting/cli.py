"""Test-time-optimization CLI:
`python -m humor_tpu.fitting.cli @configs/fit_amass_joints.cfg`.

Behavioral parity target: /root/reference/humor/fitting/run_fitting.py
(dataset construction by --data-type :69-193, model loading :232-261,
batch loop with per-stage saves :269-435; the batch-size-3 duplication
hack :286-318 is intentionally NOT replicated — it worked around a torch
bug this stack does not have).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np


def load_models(cfg):
    """Assemble TTOModels from checkpoints, falling back to synthetic /
    random models when assets are absent (keeps the CLI runnable in CI)."""
    import jax

    from humor_tpu.body_model import smpl as S
    from humor_tpu.fitting.optimizer import TTOModels
    from humor_tpu.models import gmm as G
    from humor_tpu.models import humor as H
    from humor_tpu.models import vposer as vp
    from humor_tpu.utils import import_torch as IT

    neutral = S.find_model_path(cfg.smplh_root, "neutral")
    if os.path.exists(neutral):
        body = S.load_smpl_npz(neutral, use_vtx_selector=True)
    else:
        print(f"[fit] no body model at {neutral!r}; using synthetic")
        body = S.synthetic_smpl_model()

    hcfg = H.HumorConfig(compute_dtype=cfg.model_compute_dtype or None)
    if cfg.humor_ckpt and os.path.exists(cfg.humor_ckpt):
        if cfg.humor_ckpt.endswith((".pth", ".pt")):
            humor_params = IT.load_humor_checkpoint(cfg.humor_ckpt)
        else:
            from humor_tpu.utils.checkpoint import load_state
            humor_params = load_state(cfg.humor_ckpt)["params"]
    else:
        print("[fit] no HuMoR checkpoint; using random init")
        humor_params = H.init_params(hcfg, jax.random.PRNGKey(2))

    vcfg = vp.VPoserConfig()
    if cfg.vposer_ckpt and os.path.exists(cfg.vposer_ckpt):
        vposer_params = IT.load_vposer_checkpoint(cfg.vposer_ckpt)
    else:
        print("[fit] no VPoser checkpoint; using random init")
        vposer_params = vp.init_params(vcfg, jax.random.PRNGKey(1))

    gmm = None
    if (cfg.init_motion_prior_ckpt
            and os.path.exists(cfg.init_motion_prior_ckpt)):
        gmm = G.load_npz(cfg.init_motion_prior_ckpt)

    return TTOModels(body=body, vposer_cfg=vcfg, vposer=vposer_params,
                     humor_cfg=hcfg, humor=humor_params, init_gmm=gmm)


def main(argv=None) -> Dict:
    import jax
    import jax.numpy as jnp

    from humor_tpu.data.fit_dataset import FitObsConfig, amass_fit_batches
    from humor_tpu.eval import metrics as M
    from humor_tpu.fitting import energies as E
    from humor_tpu.fitting import optimizer as O
    from humor_tpu.fitting import results as R
    from humor_tpu.fitting.optimizer import smpl_results
    from humor_tpu.train.cli import build_dataset
    from humor_tpu.utils.config import FitCLIConfig, parse_into

    cfg = parse_into(FitCLIConfig, argv, prog="humor-fit")
    os.makedirs(cfg.out, exist_ok=True)
    models = load_models(cfg)

    if cfg.data_type in ("RGB", "PROX-RGB", "PROX-RGBD", "iMapper-RGB"):
        return _run_rgb(cfg, models)
    if cfg.data_type != "AMASS":
        raise NotImplementedError(f"unknown data type {cfg.data_type!r}")

    weights = cfg.stage_weights()
    if all(w.joints3d == 0 for w in weights):
        # sensible defaults for AMASS 3D joint fitting
        weights = (
            E.StageWeights(joints3d=1.0),
            E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                           joints3d_smooth=1.0),
            E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                           motion_prior=7.5e-4, init_motion_prior=7.5e-4,
                           joint_consistency=100.0, bone_length=2000.0),
        )

    tto_cfg = O.TTOConfig(
        seq_len=cfg.seq_len,
        stage_weights=weights,
        energy=E.EnergyConfig(robust_loss=cfg.robust_loss,
                              robust_tuning_const=cfg.robust_tuning_const,
                              joints2d_sigma=cfg.joint2d_sigma),
        num_iters=tuple(int(n) * cfg.num_iters_scale
                        for n in cfg.num_iters),
        lbfgs_max_linesearch=cfg.lbfgs_max_iter,
        lbfgs_linesearch=cfg.lbfgs_linesearch,
        lbfgs_polish_frac=cfg.lbfgs_polish_frac,
        lbfgs_candidates=cfg.lbfgs_candidates or None,
        lbfgs_tol_grad=cfg.lbfgs_tol_grad or None,
        lbfgs_tol_change=cfg.lbfgs_tol_change or None,
        lbfgs_stall_patience=cfg.lbfgs_stall_patience,
        stage3_tune_init_state=not cfg.stage3_no_tune_init_state,
        stage3_tune_init_num_frames=cfg.stage3_tune_init_num_frames,
        stage3_freeze_start=cfg.stage3_freeze_start * cfg.num_iters_scale,
        stage3_freeze_end=cfg.stage3_freeze_end * cfg.num_iters_scale,
        stage3_contact_refine_only=cfg.stage3_contact_refine_only)
    runner = O.make_runner(tto_cfg, models)

    obs_cfg = FitObsConfig(
        seq_len=cfg.seq_len, use_joints=cfg.amass_use_joints,
        use_verts=cfg.amass_use_verts, use_points=cfg.amass_use_points,
        noise_std=cfg.amass_noise_std, make_partial=cfg.amass_make_partial,
        partial_height=cfg.amass_partial_height)
    dataset = build_dataset(cfg, None)

    all_metrics = []
    for bidx, (observed, gt, meta) in enumerate(
            amass_fit_batches(dataset, obs_cfg, cfg.batch_size, cfg.seed,
                              body=models.body)):
        t0 = time.time()
        obs_jax = {k: jnp.asarray(v) for k, v in observed.items()}
        try:
            res = runner(obs_jax)
            jax.block_until_ready(res.final["trans"])
        except Exception as e:  # keep the run alive per batch
            # (reference run_fitting.py:437-446 catch-and-continue)
            print(f"[fit] batch {bidx} FAILED: {e}")
            continue
        dt = time.time() - t0
        names = [f"batch{bidx:03d}_seq{i:03d}"
                 for i in range(cfg.batch_size)]
        if cfg.save_results:
            R.save_stage_results(cfg.out, "final", res.final, names)
            R.save_observations(cfg.out, observed, gt, names)
            if cfg.save_stages_results:
                for sname, sres in res.per_stage.items():
                    R.save_stage_results(cfg.out, sname, sres, names)

        # quant eval vs GT: the reference's full per-stage metric set —
        # joints + 43-keypoint verts + full mesh (eval_utils.py:71-134).
        # GT verts/mesh come from a GT SMPL pass with the dataset betas
        # (eval_fitting_3d.py gt body evaluation).
        from humor_tpu.ops import transforms as _tf

        pred = smpl_results(models.body, res.final["trans"],
                            res.final["root_orient"],
                            res.final["pose_body"], res.final["betas"])
        Bc, Tc = np.asarray(gt["trans"]).shape[:2]
        gt_root = jnp.asarray(gt["root_orient"])
        gt_pose = jnp.asarray(gt["pose_body"])
        if gt_root.shape[-1] == 9:   # windows view carries matrices
            gt_root = _tf.rotmat_to_aa(gt_root.reshape(Bc, Tc, 3, 3))
            gt_pose = _tf.rotmat_to_aa(
                gt_pose.reshape(Bc, Tc, -1, 3, 3)).reshape(Bc, Tc, -1)
        gt_betas = (jnp.asarray(meta["betas"], jnp.float32)
                    if isinstance(meta, dict) and "betas" in meta
                    else res.final["betas"])
        gt_smpl = smpl_results(models.body, jnp.asarray(gt["trans"]),
                               gt_root, gt_pose, gt_betas)
        for b in range(cfg.batch_size):
            pd = {"joints3d": pred["joints3d"][b],
                  "verts3d": pred["verts3d"][b],
                  "mesh3d": pred["points3d"][b]}
            gd = {"joints3d": jnp.asarray(gt["joints3d"][b]),
                  "verts3d": gt_smpl["verts3d"][b],
                  "mesh3d": gt_smpl["points3d"][b]}
            od = {"joints3d": obs_jax["joints3d"][b]} \
                if "joints3d" in obs_jax else {}
            if "verts3d" in obs_jax:
                od["verts3d"] = obs_jax["verts3d"][b]
            m = M.quant_eval_3d(pd, gd, od)
            all_metrics.append(m)
        mpjpe = float(np.concatenate(
            [m["joints3d_all"] for m in all_metrics[-cfg.batch_size:]]
        ).mean())
        print(f"[fit] batch {bidx}: {dt:.1f}s  MPJPE {mpjpe*1000:.1f}mm")

    table = M.aggregate(all_metrics)
    M.write_csv(os.path.join(cfg.out, "eval_mean.csv"), table)
    print(f"[fit] wrote {os.path.join(cfg.out, 'eval_mean.csv')}")
    return table


def _smpl2op_for(body) -> tuple:
    """smpl->openpose map valid for the loaded body: the real table for a
    full SMPL+H (52 joints + 21 extra vertex joints), a modulo stand-in
    for synthetic test bodies."""
    from humor_tpu.body_model import constants as C

    n_out = body.num_joints + body.vtx_joint_ids.size
    table = C.smpl_to_openpose("smplh", use_hands=False)
    if int(table.max()) < n_out:
        return tuple(int(i) for i in table)
    return tuple(int(i % n_out) for i in range(C.OP_NUM_JOINTS))


def _run_rgb(cfg, models):
    """RGB / PROX / iMapper fitting: joint optimization of ALL overlapping
    windows of a video in one device-parallel batch with overlap coupling,
    then stitching (reference run_fitting.py:195-453, with the sequential
    prev_batch chaining replaced by the all-windows batch)."""
    import jax
    import jax.numpy as jnp

    from humor_tpu.data.rgb import RGBVideoConfig, RGBVideoDataset
    from humor_tpu.fitting import energies as E
    from humor_tpu.fitting import optimizer as O
    from humor_tpu.fitting import results as R

    prox_gt = None
    if cfg.data_type.startswith("PROX"):
        from humor_tpu.data.prox import ProxConfig, ProxDataset

        ds = ProxDataset(
            cfg.data_path,
            os.path.join(os.path.dirname(cfg.data_path.rstrip("/")),
                         "..", "calibration"),
            ProxConfig(seq_len=cfg.seq_len,
                       use_depth=cfg.data_type == "PROX-RGBD",
                       load_fitting=cfg.prox_load_fitting),
            fitting_root=cfg.prox_fitting_root or None)
        observed = ds.observation_batch()
        prox_gt = ds.fitting_batch()
    elif cfg.data_type == "iMapper-RGB":
        from humor_tpu.data.imapper import IMapperConfig, IMapperDataset

        ds = IMapperDataset(cfg.data_path,
                            IMapperConfig(seq_len=cfg.seq_len))
        observed, _ = ds.observation_batch()
    else:
        cam_mat = None
        if cfg.rgb_intrinsics:
            import json as _json

            with open(cfg.rgb_intrinsics) as f:
                cam_mat = np.asarray(_json.load(f), np.float32)
        ds = RGBVideoDataset(
            cfg.data_path,
            RGBVideoConfig(
                seq_len=0 if cfg.rgb_no_split else cfg.seq_len,
                overlap_len=cfg.overlap_len),
            cam_mat=cam_mat,
            mask_path=(cfg.mask_path or None) if cfg.mask_joints2d
            else None)
        observed = ds.observation_batch()

    weights = cfg.stage_weights()
    if all(w.joints2d == 0 for w in weights):
        weights = (
            E.StageWeights(joints2d=0.001),
            E.StageWeights(joints2d=0.001, pose_prior=4e-4,
                           shape_prior=6e-3, joints3d_smooth=100.0,
                           rgb_overlap_consist=200.0),
            E.StageWeights(joints2d=0.001, pose_prior=4e-4,
                           shape_prior=6e-3, motion_prior=7.5e-4,
                           init_motion_prior=7.5e-4,
                           joint_consistency=100.0, bone_length=2000.0,
                           contact_vel=100.0, contact_height=10.0,
                           floor_reg=0.167, rgb_overlap_consist=200.0),
        )
    T = observed["joints2d"].shape[1]
    tto_cfg = O.TTOConfig(
        seq_len=T,
        stage_weights=weights,
        energy=E.EnergyConfig(robust_loss=cfg.robust_loss,
                              joints2d_sigma=cfg.joint2d_sigma,
                              smpl2op_map=_smpl2op_for(models.body)),
        num_iters=tuple(int(n) * cfg.num_iters_scale
                        for n in cfg.num_iters),
        lbfgs_max_linesearch=cfg.lbfgs_max_iter,
        lbfgs_linesearch=cfg.lbfgs_linesearch,
        lbfgs_polish_frac=cfg.lbfgs_polish_frac,
        lbfgs_candidates=cfg.lbfgs_candidates or None,
        lbfgs_tol_grad=cfg.lbfgs_tol_grad or None,
        lbfgs_tol_change=cfg.lbfgs_tol_change or None,
        lbfgs_stall_patience=cfg.lbfgs_stall_patience,
        optim_floor=True,
        stage3_tune_init_state=not cfg.stage3_no_tune_init_state,
        stage3_tune_init_num_frames=cfg.stage3_tune_init_num_frames,
        stage3_freeze_start=cfg.stage3_freeze_start * cfg.num_iters_scale,
        stage3_freeze_end=cfg.stage3_freeze_end * cfg.num_iters_scale)

    obs_jax = {k: jnp.asarray(v) for k, v in observed.items()}
    t0 = time.time()
    res = O.run(tto_cfg, models, obs_jax)
    jax.block_until_ready(res.final["trans"])
    print(f"[fit] video optimized in {time.time()-t0:.1f}s "
          f"({observed['joints2d'].shape[0]} windows x {T} frames)")

    if cfg.save_results:
        R.save_stage_results(cfg.out, "final", res.final)
        R.save_observations(cfg.out, observed, gt=prox_gt)
        has_floor = "floor_plane" in res.final
        if cfg.save_stages_results:
            for sname, sres in res.per_stage.items():
                R.save_stage_results(cfg.out, sname, sres)
            if has_floor:
                # stage-2 results re-expressed with the FINAL floor
                # (reference motion_optimizer.py:649-676)
                R.save_prior_stage_results(
                    cfg.out, "stage2", res.per_stage["stage2"],
                    models.body, np.asarray(res.final["floor_plane"]))
        if has_floor:
            # per-window prior-frame final result: the rollout already
            # produced it (reference fitting_utils.py:304-317)
            prior3 = {"trans": res.final["prior_trans"],
                      "root_orient": res.final["prior_root_orient"],
                      "pose_body": res.final["pose_body"],
                      "betas": res.final["betas"]}
            if "contacts" in res.final:
                prior3["contacts"] = res.final["contacts"]
            R.save_stage_results(cfg.out, "final", prior3,
                                 fname="final_results_prior.npz")
        stitched = R.save_stitched_result(
            cfg.out, res.final, observed,
            body=models.body if has_floor else None)
        print(f"[fit] wrote stitched result "
              f"({stitched['trans'].shape[0]} frames)")
    return res


if __name__ == "__main__":
    from humor_tpu.utils.platform import setup_platform

    setup_platform()
    main()
