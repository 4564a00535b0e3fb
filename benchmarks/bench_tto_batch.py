"""Large-batch TTO line-search A/B: wall-clock AND recovery accuracy.

Interleaved same-process comparison (tunnel/host load drifts 30%+
between processes — CLAUDE.md) of the line-search variants at a given
window batch size, on the trained synthetic-GT fixture at the knee
budget. Reports per-variant median wall-clock, windows/s, and stage-3
MPJPE so speed claims carry an equal-accuracy check.

Usage:
    python benchmarks/bench_tto_batch.py [--batch 16] [--scale 4]
        [--reps 3] [--variants parallel,armijo,zoom]
Emits one JSON line per variant.
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

T = 60
NOISE_STD = 0.02
BASE_ITERS = (30, 70, 70)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="parallel,armijo,zoom")
    ap.add_argument(
        "--cache",
        default="/tmp/humor_knee_models_s4000_ss1200x30_v96x800x64.npz",
        help="shared with bench_knee.py's auto-named default fixture")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from humor_tpu.data.synthetic import synthetic_world_batch
    from humor_tpu.fitting import energies as E
    from humor_tpu.fitting import optimizer as O
    from humor_tpu.testing import trained_tto_models

    B = args.batch
    models = trained_tto_models(sup_steps=4000, ss_steps=1200, ss_len=30,
                                cache=args.cache or None)

    def workload(seed):
        world, _ = synthetic_world_batch(seed, B, T, model=models.body)
        gt = np.asarray(world["joints"]).reshape(B, T, -1, 3)
        rng = np.random.RandomState(seed)
        noisy = gt + rng.randn(*gt.shape).astype(np.float32) * NOISE_STD
        occ = noisy.copy()
        occ[:, T // 3: 2 * T // 3] = np.inf
        return {"joints3d": jnp.asarray(occ)}, gt

    def make_cfg(variant):
        # "<linesearch>" or "<linesearch>@tol" (torch-default convergence
        # early exit: tolerance_grad 1e-7 / tolerance_change 1e-9)
        name, _, opt = variant.partition("@")
        if name == "mixed":
            # per-stage: value-only armijo for the per-frame stages 1/2
            # (each candidate pays a K*B*T-row SMPL pass), parallel for
            # the rollout stage (candidates ride idle MXU lanes)
            name = ("armijo", "armijo", "parallel")
        extra = {}
        if opt.startswith("tol"):
            extra = dict(lbfgs_tol_grad=1e-7, lbfgs_tol_change=1e-9)
            if opt[3:]:
                extra["lbfgs_stall_patience"] = int(opt[3:])
        elif opt:
            raise ValueError(f"unknown variant option {opt!r}")
        w1 = E.StageWeights(joints3d=1.0)
        w2 = E.StageWeights(joints3d=1.0, pose_prior=4e-4,
                            shape_prior=6e-3, joints3d_smooth=0.1)
        w3 = E.StageWeights(joints3d=1.0, pose_prior=4e-4,
                            shape_prior=6e-3, motion_prior=1e-4,
                            joint_consistency=10.0, bone_length=10.0,
                            joints3d_rollout=0.1)
        s = args.scale
        return O.TTOConfig(
            seq_len=T, stage_weights=(w1, w2, w3),
            num_iters=tuple(n * s for n in BASE_ITERS),
            lbfgs_linesearch=name, lbfgs_candidates=0,  # auto-K
            stage3_freeze_start=30 * s, stage3_freeze_end=55 * s,
            **extra)

    variants = args.variants.split(",")
    runners = {v: O.make_runner(make_cfg(v), models) for v in variants}

    # compile pass (not timed), then interleave reps across variants
    results = {v: {"times": [], "mpjpe": []} for v in variants}
    for rep in range(args.reps + 1):
        obs, gt = workload(900 + rep)
        for v in variants:
            t0 = time.time()
            res = runners[v](obs)
            jax.block_until_ready(res.final["trans"])
            dt = time.time() - t0
            p = O.smpl_results(models.body, res.final["trans"],
                               res.final["root_orient"],
                               res.final["pose_body"],
                               res.final["betas"], verts="none")
            err = float(np.linalg.norm(
                np.asarray(p["joints3d"]).reshape(B, T, -1, 3) - gt,
                axis=-1).mean())
            if rep > 0:  # rep 0 pays compile
                results[v]["times"].append(dt)
                results[v]["mpjpe"].append(err)
            print(f"[batch-ab] rep {rep} {v}: {dt:.2f}s mpjpe {err:.4f}",
                  file=sys.stderr, flush=True)

    for v in variants:
        r = results[v]
        wall = float(np.median(r["times"]))
        print(json.dumps({
            "variant": v, "batch": B, "scale": args.scale,
            "wallclock_s": round(wall, 3),
            "windows_per_s": round(B / wall, 2),
            "mpjpe_m": round(float(np.median(r["mpjpe"])), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
