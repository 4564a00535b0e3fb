"""Accuracy-vs-effort knee sweep: where does synthetic-GT recovery
saturate as the iteration budget grows?

Context (RESULTS.md "Iteration-budget semantics"): our `num_iters` count
TRUE L-BFGS iterations while the reference's count outer torch-LBFGS
steps of up to 20 inner iterations each
(/root/reference/humor/fitting/motion_optimizer.py:24,233-254), so 1x our
budget is up to 1/20 the reference's effective effort. The honest
headline number is the wall-clock at the budget where the recovery curve
saturates — this sweep locates that knee.

Workload: the synthetic-GT recovery fixture (humor_tpu.testing — briefly
trained HuMoR + VPoser on the procedural generator), fitting B x 60-frame
held-out windows with sigma=2cm joint noise and an inf-masked middle
third, at num_iters = scale * (30, 70, 70).

Usage:
    python benchmarks/bench_knee.py --scales 1,2,4,8,20 [--reps 3]
Emits one JSON line per scale:
    {"scale": s, "wallclock_s": w, "mpjpe_vis_m": v, "mpjpe_occ_m": o}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

B, T = 2, 60
NOISE_STD = 0.02
BASE_ITERS = (30, 70, 70)


def build_workload(models, seed=777):
    import jax.numpy as jnp

    from humor_tpu.data.synthetic import synthetic_world_batch

    world, _ = synthetic_world_batch(seed, B, T, model=models.body)
    gt = np.asarray(world["joints"]).reshape(B, T, -1, 3)
    rng = np.random.RandomState(11)
    noisy = gt + rng.randn(*gt.shape).astype(np.float32) * NOISE_STD
    occ = noisy.copy()
    occ[:, T // 3: 2 * T // 3] = np.inf
    return {"joints3d": jnp.asarray(occ)}, gt


def make_cfg(scale: int, linesearch: str = "parallel",
             s12_scale: int = 0):
    """s12_scale > 0 pins stages 1/2 at that scale while `scale` drives
    only stage 3 — isolates stage-3 effort from the init-shift chaos of
    scaling every stage jointly (a different stage-2 budget hands stage 3
    a different starting point, so joint scaling confounds 'more
    optimizer effort' with 'different basin')."""
    from humor_tpu.fitting import energies as E
    from humor_tpu.fitting import optimizer as O

    w1 = E.StageWeights(joints3d=1.0)
    w2 = E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                        joints3d_smooth=0.1)
    w3 = E.StageWeights(joints3d=1.0, pose_prior=4e-4, shape_prior=6e-3,
                        motion_prior=1e-4, joint_consistency=10.0,
                        bone_length=10.0, joints3d_rollout=0.1)
    s12 = s12_scale or scale
    return O.TTOConfig(
        seq_len=T, stage_weights=(w1, w2, w3),
        num_iters=(BASE_ITERS[0] * s12, BASE_ITERS[1] * s12,
                   BASE_ITERS[2] * scale),
        lbfgs_linesearch=linesearch,
        stage3_freeze_start=30 * scale, stage3_freeze_end=55 * scale)


def mpjpe_split(pred_joints, gt):
    vis = np.ones(T, bool)
    vis[T // 3: 2 * T // 3] = False
    err = np.linalg.norm(
        np.asarray(pred_joints).reshape(B, T, -1, 3) - gt, axis=-1)
    return float(err[:, vis].mean()), float(err[:, ~vis].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4,8,20")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--linesearch", default="parallel",
                    help="comma list interleaves variants rep-by-rep in "
                         "ONE process (tunnel/host load drifts 30%+ "
                         "between processes — CLAUDE.md)")
    ap.add_argument("--seed-base", type=int, default=777,
                    help="workload seed for rep 0 (rep i uses base+i); "
                         "900 = the documented hard-seed set")
    ap.add_argument("--s12-scale", type=int, default=0,
                    help="pin stage-1/2 budgets at this scale while "
                         "--scales drives only stage 3 (attribution "
                         "mode: constant stage-3 init)")
    # fixture-model quality: the T=60 open-loop rollout needs a prior
    # trained with long scheduled-sampling windows, or stage 3 measures
    # model capacity instead of optimizer effort (the reference's
    # released checkpoint is a fully-trained prior — the bigger fixture
    # is the honest analogue)
    ap.add_argument("--sup-steps", type=int, default=4000)
    ap.add_argument("--ss-steps", type=int, default=1200)
    ap.add_argument("--ss-len", type=int, default=30)
    # fixture-VPoser capacity: the pose round-trip floor caps measurable
    # stage-2/3 MPJPE (the 96/800 default measured 0.1675 rad MAE);
    # sweep these to check the knee is set by optimizer effort, not the
    # fixture (VERDICT r3 weak #5)
    # defaults = the round-5 upgraded fixture (round-trip MAE 0.1507
    # rad): with the old 96/800/64 fixture the joint-scaling sweep was
    # non-monotone because weak stage-2 basins fed stage 3 chaotic
    # inits (RESULTS.md "Knee monotonicity: attribution")
    ap.add_argument("--vp-hidden", type=int, default=256)
    ap.add_argument("--vp-steps", type=int, default=3000)
    ap.add_argument("--vp-seqs", type=int, default=128)
    ap.add_argument("--cache", default="",
                    help="npz cache for the trained fixture models "
                         "('' = auto path keyed by the fixture params, "
                         "'none' = retrain)")
    args = ap.parse_args()
    if args.cache == "":
        args.cache = (f"/tmp/humor_knee_models_s{args.sup_steps}_"
                      f"ss{args.ss_steps}x{args.ss_len}_v{args.vp_hidden}"
                      f"x{args.vp_steps}x{args.vp_seqs}.npz")
    elif args.cache == "none":
        args.cache = ""

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from humor_tpu.fitting import optimizer as O
    from humor_tpu.fitting.optimizer import smpl_results
    from humor_tpu.testing import trained_tto_models

    t0 = time.time()
    models = trained_tto_models(sup_steps=args.sup_steps,
                                ss_steps=args.ss_steps,
                                ss_len=args.ss_len,
                                vp_hidden=args.vp_hidden,
                                vp_steps=args.vp_steps,
                                vp_seqs=args.vp_seqs,
                                cache=args.cache or None)
    print(f"[knee] models trained in {time.time()-t0:.0f}s",
          file=sys.stderr)

    # model-quality floor: VPoser round-trip on the GT window poses.
    # The TTO routes all body pose through latent2pose, so its recon
    # error lower-bounds any stage-2/3 MPJPE — print it so a bad fit
    # can be attributed (mini-model quality vs optimizer trouble).
    from humor_tpu.data.synthetic import synthetic_world_batch
    from humor_tpu.models import vposer as vp
    from humor_tpu.ops import transforms
    world, _ = synthetic_world_batch(777, B, T, model=models.body)
    pose_aa = transforms.rotmat_to_aa(
        jnp.asarray(np.asarray(world["pose_body"]).reshape(-1, 21, 3, 3))
    ).reshape(-1, 63)
    mu, _ = vp.encode(models.vposer_cfg, models.vposer, pose_aa)
    rec = vp.latent2pose(models.vposer_cfg, models.vposer, mu)
    print(f"[knee] vposer GT-pose round-trip MAE "
          f"{float(jnp.mean(jnp.abs(rec - pose_aa))):.4f} rad",
          file=sys.stderr)

    scales = [int(s) for s in args.scales.split(",")]
    searches = args.linesearch.split(",")
    for scale in scales:
        runners = {ls: O.make_runner(
            make_cfg(scale, ls, s12_scale=args.s12_scale), models)
                   for ls in searches}
        acc = {ls: {"times": [], "vis": [], "occ": [], "e3": []}
               for ls in searches}
        for rep in range(args.reps):
            # fresh inputs per rep: identical (program, input) pairs can
            # hit remote execution caching (CLAUDE.md)
            observed, gt = build_workload(models, seed=args.seed_base + rep)
            for ls in searches:  # interleaved within the rep
                a = acc[ls]
                t0 = time.time()
                res = runners[ls](observed)
                jax.block_until_ready(res.final["trans"])
                dt = time.time() - t0
                if rep == 0:
                    a["compile_s"] = dt  # first rep pays compile
                else:
                    a["times"].append(dt)
                p = smpl_results(models.body, res.final["trans"],
                                 res.final["root_orient"],
                                 res.final["pose_body"],
                                 res.final["betas"], verts="none")
                v, o = mpjpe_split(p["joints3d"], gt)
                a["vis"].append(v)
                a["occ"].append(o)
                # final stage-3 ENERGY alongside MPJPE: if energy
                # decreases monotonically with effort while MPJPE
                # doesn't, the non-monotone MPJPE-vs-effort curve is the
                # energy<->metric mismatch (occluded frames have no data
                # term), not line-search fragility
                a["e3"].append(float(np.nanmin(
                    np.asarray(res.losses["stage3"]))))
                if rep == 0:  # per-stage attribution
                    for st in ("stage1", "stage2", "stage3"):
                        s = res.per_stage[st]
                        ps = smpl_results(models.body, s["trans"],
                                          s["root_orient"], s["pose_body"],
                                          s["betas"], verts="none")
                        sv, so = mpjpe_split(ps["joints3d"], gt)
                        print(f"[knee] scale {scale} {ls} {st}: vis "
                              f"{sv:.3f} occ {so:.3f}", file=sys.stderr,
                              flush=True)
        for ls in searches:
            a = acc[ls]
            wall = (float(np.median(a["times"])) if a["times"]
                    else a["compile_s"])
            print(json.dumps({
                "scale": scale,
                "linesearch": ls,
                "seed_base": args.seed_base,
                "num_iters": list(make_cfg(
                    scale, s12_scale=args.s12_scale).num_iters),
                "wallclock_s": round(wall, 3),
                "mpjpe_vis_m": round(float(np.median(a["vis"])), 4),
                "mpjpe_occ_m": round(float(np.median(a["occ"])), 4),
                "stage3_energy_median": round(float(np.median(a["e3"])),
                                              2),
            }), flush=True)


if __name__ == "__main__":
    main()
