"""Training-step throughput benchmark at the reference config
(batch 200 windows x 10 frames, full ELBO incl. gendered SMPL losses —
reference configs/train_humor.cfg, README.md:146).

Usage: python benchmarks/bench_train.py [--ss] [--dtype bfloat16]
Prints one JSON line: supervised (or sched-samp) step wall-clock + the
implied transitions/s. Runs on whatever backend jax selects (real TPU
chip when run plainly; HUMOR_PLATFORM=cpu for the virtual mesh).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B, T = 200, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ss", action="store_true",
                    help="benchmark the scheduled-sampling step instead")
    ap.add_argument("--dtype", default=os.environ.get(
        "HUMOR_COMPUTE_DTYPE", ""), help="MLP compute dtype, e.g. bfloat16")
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--no-smpl-losses", action="store_true",
                    help="disable the gendered SMPL joint/mesh losses "
                         "(isolates the CVAE+ELBO cost)")
    ap.add_argument("--smpl-dtype", default="",
                    help="loss-body per-vertex LBS dtype: 'bfloat16' "
                         "casts the skinning pipeline (joints stay f32; "
                         "LossConfig.smpl_loss_dtype)")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="k>1 scans k steps over stacked batches in one "
                         "device program (train/step.make_multi_steps), "
                         "amortizing the ~32-44 ms fixed dispatch cost; "
                         "reported wall-clock and transitions/s are "
                         "per single step")
    ap.add_argument("--time-gather", action="store_true",
                    help="instead of the device step, time the HOST data "
                         "pipeline per batch (native C++ window gather + "
                         "the jitted window_to_pairs canonicalization) — "
                         "proves the loader keeps up with the device "
                         "step rate")
    args = ap.parse_args()

    from humor_tpu.utils.platform import setup_platform
    setup_platform()
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.data.synthetic import synthetic_world_batch
    from humor_tpu.data.windows import window_to_pairs
    from humor_tpu.losses.elbo import LossConfig
    from humor_tpu.models import humor as H
    from humor_tpu.train import step as TS

    model = synthetic_smpl_model(num_verts=6890, num_joints=22)

    if args.time_gather:
        return time_gather(args, model)
    cfg = H.HumorConfig(compute_dtype=args.dtype or None)
    opt = TS.make_optimizer(lr=1e-4, steps_per_epoch=200)
    state = TS.init_train_state(cfg, opt, jax.random.PRNGKey(0))
    if args.no_smpl_losses:
        lcfg = LossConfig(smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
                          smpl_joint_consistency_loss=0.0)
        smpl_models = None
    else:
        lcfg = LossConfig(smpl_loss_dtype=args.smpl_dtype)
        smpl_models = {"male": model, "female": model}
    sup, ss, _ = TS.make_train_steps(cfg, lcfg, opt, smpl_models)
    k = args.steps_per_dispatch
    if k > 1:
        multi_sup, multi_ss = TS.make_multi_steps(sup, ss, k)
        step = multi_ss if args.ss else multi_sup
    else:
        step = ss if args.ss else sup

    def make_batch(seed):
        world, meta = synthetic_world_batch(seed, args.batch, T + 1,
                                            model=model)
        data_in, data_out, _ = window_to_pairs(world)
        return {"data_in": data_in, "data_out": data_out,
                "betas": meta["betas"], "gender_ids": meta["gender_ids"]}

    def make_dispatch_batch(seed):
        if k == 1:
            return make_batch(seed)
        import jax.numpy as jnp
        stack = [make_batch(seed * k + j) for j in range(k)]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *stack)

    batches = [make_dispatch_batch(s) for s in range(4)]
    key = jax.random.PRNGKey(1)

    def run(st_in, i):
        extra = (0.5,) if args.ss else ()
        return step(st_in, batches[i % 4], jax.random.fold_in(key, i), 20,
                    *extra)

    # compile + warm the tunnel. The multi-step path donates its input
    # state (make_multi_steps donate_argnums=0), so thread the returned
    # state through instead of reusing the original buffer.
    for i in range(6):
        state, stats = run(state, i)
        jax.block_until_ready(stats["total_loss"])
    times = []
    for i in range(10):
        t0 = time.perf_counter()
        state, stats = run(state, 6 + i)
        jax.block_until_ready(stats["total_loss"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2] / k  # per single step
    print(json.dumps({
        "metric": ("sched_samp" if args.ss else "supervised")
        + f"_step_b{args.batch}x{T}"
        + (f"_k{k}" if k > 1 else ""),
        "value": round(dt * 1000.0, 2),
        "unit": "ms",
        "dtype": args.dtype or "float32",
        "smpl_dtype": args.smpl_dtype or "float32",
        "transitions_per_s": round(args.batch * T / dt),
    }))


def time_gather(args, model):
    """Host-pipeline cost per training batch: the native threaded window
    gather over a realistic flat store + the jitted window_to_pairs
    canonicalization (the two host-side stages feeding every step)."""
    import jax
    import numpy as np

    from humor_tpu.data import amass as A
    from humor_tpu.data.dataset import AmassDataset
    from humor_tpu.data.windows import window_to_pairs
    import jax.numpy as jnp

    # a realistically-sized store built through the real preprocessing
    # path (process_sequence fills every packed component): gather cost
    # scales with batch/window size, not store size, so ~40 x 400 frames
    # is representative
    seqs = []
    rng = np.random.RandomState(0)
    for i in range(40):
        frames = 400
        raw = {
            "fps": np.asarray(60.0),
            "gender": ["male", "female"][i % 2],
            "trans": np.cumsum(rng.randn(frames, 3) * 0.01, axis=0),
            "root_orient": rng.randn(frames, 3) * 0.2,
            "pose_body": rng.randn(frames, 63) * 0.1,
            "betas": rng.randn(16) * 0.3,
        }
        seq = A.process_sequence(model, raw, discard_terrain=False)
        assert seq is not None
        seqs.append(seq)
    ds = AmassDataset.from_processed(seqs)
    to_pairs = jax.jit(window_to_pairs)

    def one_batch(seed):
        world, meta = ds.sample_windows(seed, args.batch, T + 1)
        out = to_pairs({k: jnp.asarray(v) for k, v in world.items()})
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return world

    one_batch(0)  # warm the jit
    t_gather, t_total = [], []
    for i in range(20):
        t0 = time.perf_counter()
        ds.sample_windows(100 + i, args.batch, T + 1)
        t_gather.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        one_batch(200 + i)
        t_total.append(time.perf_counter() - t0)
    t_gather.sort(), t_total.sort()
    print(json.dumps({
        "metric": f"host_pipeline_b{args.batch}x{T}",
        "gather_ms": round(t_gather[len(t_gather) // 2] * 1000.0, 2),
        "gather_plus_pairs_ms": round(t_total[len(t_total) // 2]
                                      * 1000.0, 2),
        "unit": "ms",
    }))


if __name__ == "__main__":
    main()
