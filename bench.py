"""Benchmark entry point. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline benchmark: full 3-stage test-time-optimization wall-clock per
60-frame batch-2 sub-sequence on the RGB-video workload — 2D OpenPose
keypoints + floor-plane optimization + cam2prior rollout + overlap
consistency, i.e. the i3DB/PROX configuration BASELINE.md names as the
driver metric. Runs benchmarks/bench_tto.py's workload at the measured
accuracy-knee budget (KNEE_SCALE x the reference's 30/70/70 outer
counts — the budget where synthetic-GT recovery saturates,
benchmarks/bench_knee.py + RESULTS.md "accuracy-vs-effort knee"), so the
number means "wall-clock at accuracy parity", not wall-clock at a
fraction of the reference's effort. vs_baseline is the measured speedup
over a faithful torch-CPU re-creation of the reference's RGB closure
structure at the reference's own default budget (per-iteration
VPoser+SMPL+projection+overlap evals for stages 1/2; cam2prior + T-step
Python rollout + VPoser re-encode + dual SMPL passes for stage 3),
extrapolated from real torch LBFGS iterations. The joints3d-modality
number (the fit_amass_joints workload, tracked since round 1) rides
along as aux fields.

Falls back to the rollout micro-benchmark if the TTO workload fails.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def bench_jax_rollout(batch=16, steps=60, iters=5):
    import jax
    import numpy as np

    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.data.synthetic import synthetic_world_batch
    from humor_tpu.models import humor as H

    cfg = H.HumorConfig()
    params = H.init_params(cfg, jax.random.PRNGKey(0))
    body = synthetic_smpl_model()
    world, _ = synthetic_world_batch(0, batch, 2, model=body)
    init_state = {k: v[:, 0] for k, v in world.items()
                  if k in cfg.input_spec.names}

    fn = jax.jit(lambda p, k, s: H.rollout(cfg, p, k, s, steps,
                                           canonicalize_input=True)
                 .world["trans"])
    key = jax.random.PRNGKey(1)
    # compile + warm the execution path (the remote-TPU tunnel needs
    # several round trips before timings stabilize)
    for i in range(10):
        fn(params, jax.random.fold_in(key, 1000 + i),
           init_state).block_until_ready()
    times = []
    for i in range(max(iters, 10)):
        t0 = time.perf_counter()
        fn(params, jax.random.fold_in(key, i), init_state).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]  # median seconds per batch rollout


def bench_torch_reference_style(batch=16, steps=60, iters=2):
    """Reference-style rollout: per-step Python loop, torch MLPs of the
    same architecture (4x1024 prior + decoder w/ latent skip), per-step
    heading canonicalization. CPU torch (no CUDA in this image)."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    D, L = 339, 48

    def mlp(sizes):
        layers = [torch.nn.Linear(sizes[0], sizes[1])]
        for i in range(1, len(sizes) - 1):
            layers += [torch.nn.GroupNorm(16, sizes[i]), torch.nn.ReLU(),
                       torch.nn.Linear(sizes[i], sizes[i + 1])]
        return torch.nn.Sequential(*layers)

    prior = mlp([D, 1024, 1024, 1024, 1024, L * 2])
    decoder = mlp([D + L, 1024, 1024, 512, 216])

    def rollout_once():
        x = torch.randn(batch, D)
        with torch.no_grad():
            for _ in range(steps):
                pz = prior(x)
                m, lv = pz[:, :L], pz[:, L:]
                z = m + torch.randn_like(m) * torch.exp(0.5 * lv)
                out = decoder(torch.cat([x, z], dim=1))
                # stand-in for delta-compose + canonicalization cost:
                # a few small matmuls per step like the reference
                R = torch.randn(batch, 3, 3)
                _ = torch.matmul(R, R)
                x = torch.cat([out, x[:, 216:]], dim=1)
        return x

    rollout_once()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        rollout_once()
    return (time.perf_counter() - t0) / iters


def main():
    _enable_compile_cache()
    try:
        from benchmarks.bench_tto import (KNEE_SCALE, NUM_ITERS,
                                          bench_ours,
                                          bench_reference_style)

        ours_rgb = bench_ours(quick=False, modality="rgb")  # knee budget
        try:
            ref_rgb = bench_reference_style(quick=True, modality="rgb")
            vs_rgb = ref_rgb / ours_rgb
        except Exception:
            vs_rgb = float("nan")
        out = {
            "metric": "tto_rgb_60frame_batch2_wallclock_at_knee",
            "value": round(ours_rgb, 3),
            "unit": "s",
            "vs_baseline": round(vs_rgb, 2),
            "num_iters": [n * KNEE_SCALE for n in NUM_ITERS],
        }
        # the joints3d workload (round 1-3 headline) as aux fields
        try:
            ours_j = bench_ours(quick=False, modality="joints3d")
            ref_j = bench_reference_style(quick=True)
            out["joints3d_s"] = round(ours_j, 3)
            out["joints3d_vs_baseline"] = round(ref_j / ours_j, 2)
        except Exception:
            pass
        print(json.dumps(out))
        return
    except Exception as e:
        print(f"[bench] TTO benchmark failed ({e}); "
              "falling back to rollout", file=sys.stderr)

    dt_jax = bench_jax_rollout()
    try:
        dt_ref = bench_torch_reference_style()
        vs = dt_ref / dt_jax
    except Exception:
        vs = float("nan")
    print(json.dumps({
        "metric": "rollout_60steps_b16_wallclock",
        "value": round(dt_jax * 1000.0, 3),
        "unit": "ms",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
