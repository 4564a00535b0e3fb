"""Encode-decode reconstruction micro-benchmark (BASELINE.md baseline
config #2, `test_humor_recon.cfg`): posterior inference over a
world-frame sequence (scan over step pairs) + latent rollout back
through the decoder — the eval/humor_eval.reconstruct path.

Baseline: reference-style per-step torch-CPU loop of the same
architecture (encoder+prior+decoder MLP stacks), per-step
canonicalization stand-in — eval_recon's structure (test_humor.py:
241-338) without datasets.

Usage: python benchmarks/bench_recon.py [--batch 16] [--frames 60]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def bench_ours(batch, frames):
    import jax
    import numpy as np

    from humor_tpu.body_model.smpl import synthetic_smpl_model
    from humor_tpu.data.synthetic import synthetic_world_batch
    from humor_tpu.eval import humor_eval as HE
    from humor_tpu.models import humor as H

    cfg = H.HumorConfig()
    params = H.init_params(cfg, jax.random.PRNGKey(0))
    body = synthetic_smpl_model()

    recon = jax.jit(lambda p, seq: HE.reconstruct(cfg, p, seq)["trans"])

    def make_seq(seed):
        world, _ = synthetic_world_batch(seed, batch, frames, model=body)
        return {k: v for k, v in world.items()
                if k in cfg.input_spec.names}

    out = recon(params, make_seq(0))
    out.block_until_ready()  # compile
    times = []
    for i in range(8):
        seq = make_seq(i + 1)
        t0 = time.perf_counter()
        recon(params, seq).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def bench_torch_reference_style(batch, frames):
    """Per-step python loop: T-1 posterior (encoder) passes + T-1
    decoder passes + per-step small-matmul canonicalization stand-in
    (the reference's infer_global_seq + roll_out structure)."""
    import torch

    torch.manual_seed(0)
    D, L = 339, 48

    def mlp(sizes):
        layers = [torch.nn.Linear(sizes[0], sizes[1])]
        for i in range(1, len(sizes) - 1):
            layers += [torch.nn.GroupNorm(16, sizes[i]), torch.nn.ReLU(),
                       torch.nn.Linear(sizes[i], sizes[i + 1])]
        return torch.nn.Sequential(*layers)

    encoder = mlp([D * 2, 1024, 1024, 1024, 1024, L * 2])
    prior = mlp([D, 1024, 1024, 1024, 1024, L * 2])
    decoder = mlp([D + L, 1024, 1024, 512, 216])

    def recon_once():
        x = torch.randn(batch, D)
        with torch.no_grad():
            zs = []
            for _ in range(frames - 1):
                e = encoder(torch.cat([x, x], dim=1))
                zs.append(e[:, :L])
                R = torch.randn(batch, 3, 3)
                _ = torch.matmul(R, R)
            for z in zs:
                _ = prior(x)
                out = decoder(torch.cat([x, z], dim=1))
                R = torch.randn(batch, 3, 3)
                _ = torch.matmul(R, R)
                x = torch.cat([out, x[:, 216:]], dim=1)
        return x

    recon_once()  # warm
    t0 = time.perf_counter()
    recon_once()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    ours = bench_ours(args.batch, args.frames)
    try:
        ref = bench_torch_reference_style(args.batch, args.frames)
        vs = ref / ours
    except Exception:
        ref, vs = float("nan"), float("nan")
    print(json.dumps({
        "metric": f"recon_b{args.batch}x{args.frames}_wallclock",
        "value": round(ours * 1000.0, 2),
        "unit": "ms",
        "vs_baseline": round(vs, 2),
        "baseline_ms": round(ref * 1000.0, 2),
    }))


if __name__ == "__main__":
    main()
