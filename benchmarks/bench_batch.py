"""Large-batch TTO throughput A/B: line-search variants x window batch.

VERDICT r2 item 8 / RESULTS.md candidates (2)+(3): at the
weight-stationary MXU bound the rollout cost is independent of batch
until K*B ~ 128 rows, so throughput should rise nearly linearly with B
if the candidate grid sheds size. This measures, interleaved in ONE
process (tunnel/host load drifts 30%+ between runs — CLAUDE.md):

  - parallel K=8 (previous default)
  - parallel K=auto (resolve_candidates: clamp(128//B, 4, 16))
  - armijo  K=auto (value-only accept, no grad in the candidate sweep)

per B in --batches, reporting wall-clock, windows/s, and the final
mean fit error vs the synthetic GT joints (equal-accuracy guard).

Usage: python benchmarks/bench_batch.py [--batches 2,16,32] [--reps 3]
       [--quick]  (4/4/4 iters, for wiring checks)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 60
NUM_ITERS = (30, 70, 70)
V_VERTS = 6890


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,16,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.fitting import energies as E
    from humor_tpu.fitting import optimizer as O
    from humor_tpu.models import gmm as gmm_lib
    from humor_tpu.models import humor as H
    from humor_tpu.models import vposer as vp

    body = synthetic_smpl_model(num_verts=V_VERTS, num_joints=22)
    vcfg = vp.VPoserConfig()
    hcfg = H.HumorConfig()
    models = O.TTOModels(
        body=body, vposer_cfg=vcfg,
        vposer=vp.init_params(vcfg, jax.random.PRNGKey(1)),
        humor_cfg=hcfg, humor=H.init_params(hcfg, jax.random.PRNGKey(2)),
        init_gmm=gmm_lib.GmmParams(jnp.ones((12,)) / 12,
                                   jnp.zeros((12, 138)),
                                   jnp.broadcast_to(jnp.eye(138),
                                                    (12, 138, 138))))

    def make_obs(batch, seed):
        rng = np.random.RandomState(seed)
        z = jnp.asarray(rng.randn(batch, T, vcfg.latent_dim) * 0.3,
                        jnp.float32)
        pose = vp.latent2pose(vcfg, models.vposer, z)
        trans = jnp.asarray(rng.randn(batch, T, 3) * 0.1, jnp.float32)
        ro = jnp.asarray(np.tile(rng.randn(batch, 1, 3) * 0.2, (1, T, 1)),
                         jnp.float32)
        gt = O.smpl_results(models.body, trans, ro, pose,
                            jnp.zeros((batch, 16)), verts="none")
        return {"joints3d": gt["joints3d"]}

    iters = (4, 4, 4) if args.quick else NUM_ITERS
    w1 = E.StageWeights(joints3d=1.0)
    w2 = E.StageWeights(joints3d=1.0, pose_prior=2e-4,
                        shape_prior=1.67e-4, joints3d_smooth=10.0)
    w3 = E.StageWeights(joints3d=1.0, shape_prior=1.67e-4,
                        motion_prior=1e-3, init_motion_prior=1e-3,
                        joint_consistency=1.0, bone_length=10.0,
                        contact_vel=1.0, contact_height=1.0)

    def make_cfg(linesearch, candidates):
        return O.TTOConfig(
            seq_len=T, stage_weights=(w1, w2, w3), num_iters=iters,
            stage3_freeze_start=min(30, iters[2]),
            stage3_freeze_end=min(55, iters[2]),
            lbfgs_linesearch=linesearch, lbfgs_candidates=candidates)

    variants = [
        ("parallel_k8", make_cfg("parallel", 8)),
        ("parallel_auto", make_cfg("parallel", None)),
        ("armijo_auto", make_cfg("armijo", None)),
    ]

    # build + compile every (variant, batch) runner first
    cells = {}
    for B in batches:
        for name, cfg in variants:
            t0 = time.perf_counter()
            runner = O.make_runner(cfg, models)
            res = runner(make_obs(B, 0))
            jax.block_until_ready(res.final["trans"])
            print(f"[compile] B={B} {name}: "
                  f"{time.perf_counter()-t0:.0f}s "
                  f"K={O.resolve_candidates(cfg.lbfgs_candidates, B)}",
                  file=sys.stderr, flush=True)
            cells[(B, name)] = (runner, [], [])

    # interleaved timing: one rep of every cell, round-robin
    for rep in range(args.reps):
        for (B, name), (runner, times, errs) in cells.items():
            obs = make_obs(B, rep + 1)
            t0 = time.perf_counter()
            res = runner(obs)
            jax.block_until_ready(res.final["trans"])
            dt = time.perf_counter() - t0
            pred = O.smpl_results(
                models.body, res.final["trans"], res.final["root_orient"],
                res.final["pose_body"], res.final["betas"], verts="none")
            err = float(jnp.mean(jnp.linalg.norm(
                pred["joints3d"] - obs["joints3d"], axis=-1)))
            times.append(dt)
            errs.append(err)
            print(f"[rep {rep}] B={B} {name}: {dt:.3f}s "
                  f"err={err*1000:.1f}mm", file=sys.stderr, flush=True)

    rows = []
    for (B, name), (_, times, errs) in sorted(cells.items()):
        dt = min(times)
        rows.append({"batch": B, "variant": name, "wallclock_s": round(dt, 3),
                     "windows_per_s": round(B / dt, 2),
                     "fit_err_mm": round(1000 * float(np.median(errs)), 1)})
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
