"""Fitting-results evaluation CLI: quantitative per-stage metrics over a
TTO output directory.

Behavioral parity target: /root/reference/humor/fitting/eval_fitting_3d.py
(per-sequence quant eval :361-491 aggregated to per-stage CSVs incl.
compare_mean.csv) and eval_fitting_2d.py (plausibility / comparison
skeleton).

Usage: python -m humor_tpu.eval.fitting_cli --results ./out/fit --out ./out/fit_eval
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, List

import numpy as np


@dataclass
class FitEvalConfig:
    results: str = "./out/humor_fit"
    out: str = ""
    stages: str = "final"   # comma-separated stage names to evaluate
    smplh_root: str = "./body_models/smplh"
    mode: str = "3d"        # '3d' (vs GT joints) | '2d' (plausibility)
    #                         | 'prox' (vs PROXD/MoSh pseudo-GT fits)
    qual: bool = False      # side-by-side stage-vs-GT comparison gifs
    #                         (reference eval_fitting_3d.py --qual :251-359)
    qual_fps: float = 30.0
    qual_max_seqs: int = 4  # cap rendered sequences (rendering is slow)


def _load_seq_dirs(results_dir: str) -> List[str]:
    return sorted(
        d for d in glob.glob(os.path.join(results_dir, "*"))
        if os.path.isdir(d)
        and os.path.exists(os.path.join(d, "observations.npz")))


def evaluate_stage(stage: str, seq_dirs: List[str], body,
                   mode: str = "3d") -> Dict[str, Dict[str, float]]:
    import jax.numpy as jnp

    from humor_tpu.eval import metrics as M
    from humor_tpu.fitting.optimizer import smpl_results

    per_seq = []
    for d in seq_dirs:
        res_path = os.path.join(d, f"{stage}_results.npz")
        if not os.path.exists(res_path):
            continue
        res = dict(np.load(res_path))
        obs = dict(np.load(os.path.join(d, "observations.npz")))
        gt_path = os.path.join(d, "gt_results.npz")
        gt = dict(np.load(gt_path)) if os.path.exists(gt_path) else {}

        pred = smpl_results(
            body, jnp.asarray(res["trans"])[None],
            jnp.asarray(res["root_orient"])[None],
            jnp.asarray(res["pose_body"])[None],
            jnp.asarray(res["betas"])[None])
        pred_j = pred["joints3d"][0]

        if mode == "3d" and "joints3d" in gt:
            pd = {"joints3d": pred_j}
            if "contacts" in res and "contacts" in gt:
                pd["contacts"] = res["contacts"]
            gd = {"joints3d": jnp.asarray(gt["joints3d"])}
            if "contacts" in pd:
                gd["contacts"] = gt["contacts"]
            od = {"joints3d": jnp.asarray(obs["joints3d"])} \
                if "joints3d" in obs else {}
            per_seq.append(M.quant_eval_3d(pd, gd, od))
        elif mode == "prox" and "pose_body" in gt and "valid" in gt:
            # PROXD/MoSh pseudo-GT SMPL fits (10 betas, per frame) ->
            # joints via our body model, dummy frames masked out
            gt_j = _pseudo_gt_joints(body, gt)
            per_seq.append(M.quant_eval_prox(
                pred_j, gt_j, np.asarray(gt["valid"], bool),
                floor_plane=res.get("floor_plane")))
        else:
            floor = res.get("floor_plane")
            per_seq.append(M.quant_eval_2d(
                pred_j, floor_plane=floor))
    return M.aggregate(per_seq) if per_seq else {}


def _pseudo_gt_joints(body, gt: Dict[str, np.ndarray]) -> "np.ndarray":
    """SMPL joints (T, 22, 3) from a PROX pseudo-GT fit dict with
    per-frame 10-d betas (zero-padded to the model's beta count)."""
    import jax.numpy as jnp

    from humor_tpu.body_model import constants as C
    from humor_tpu.body_model import smpl as smpl_lib

    trans = np.asarray(gt["trans"], np.float32)
    T = trans.shape[0]
    betas = np.asarray(gt["betas"], np.float32).reshape(T, -1)
    nb = body.num_betas
    padded = np.zeros((T, nb), np.float32)
    k = min(nb, betas.shape[1])
    padded[:, :k] = betas[:, :k]
    out = smpl_lib.forward(
        body, jnp.asarray(np.asarray(gt["root_orient"], np.float32)),
        jnp.asarray(np.asarray(gt["pose_body"], np.float32)),
        jnp.asarray(padded), jnp.asarray(trans),
        vert_ids=np.zeros((0,), np.int32))
    return jnp.asarray(out.Jtr[:, : C.NUM_SMPL_JOINTS])


def render_qual(stages: List[str], seq_dirs: List[str], body,
                out_dir: str, fps: float = 30.0) -> List[str]:
    """Side-by-side skeleton comparison gifs, one per sequence: each
    requested stage next to GT (the reference's --qual rendering of
    HuMoR vs VPoser-t vs GT, eval_fitting_3d.py:251-359 — stage2 IS the
    VPoser-t baseline, stage3/final the HuMoR result)."""
    import jax.numpy as jnp

    from humor_tpu.fitting.optimizer import smpl_results
    from humor_tpu.viz.utils import create_gif, render_comparison_seq

    written = []
    for d in seq_dirs:
        seqs, labels = [], []
        for stage in stages:
            p = os.path.join(d, f"{stage}_results.npz")
            if not os.path.exists(p):
                continue
            res = dict(np.load(p))
            pred = smpl_results(
                body, jnp.asarray(res["trans"])[None],
                jnp.asarray(res["root_orient"])[None],
                jnp.asarray(res["pose_body"])[None],
                jnp.asarray(res["betas"])[None], verts="none")
            seqs.append(np.asarray(pred["joints3d"][0]))
            labels.append(stage)
        gt_path = os.path.join(d, "gt_results.npz")
        if os.path.exists(gt_path):
            gt = dict(np.load(gt_path))
            if "joints3d" in gt:
                seqs.append(np.asarray(gt["joints3d"]))
                labels.append("GT")
        if not seqs:
            continue
        name = os.path.basename(d.rstrip("/"))
        frame_dir = os.path.join(out_dir, "qual", name)
        frames = render_comparison_seq(seqs, labels, frame_dir,
                                       prefix=name)
        gif = create_gif(frames, os.path.join(out_dir, "qual",
                                              f"{name}.gif"), fps=fps)
        written.append(gif)
        print(f"[fit-eval] qual: {gif}")
    return written


def main(argv=None) -> Dict:
    from humor_tpu.eval import metrics as M
    from humor_tpu.fitting.cli import load_models
    from humor_tpu.utils.config import FitCLIConfig, parse_into

    cfg = parse_into(FitEvalConfig, argv, prog="humor-eval-fitting")
    out_dir = cfg.out or (cfg.results.rstrip("/") + "_eval")
    os.makedirs(out_dir, exist_ok=True)

    # body model only (reuse fit CLI loader defaults)
    models = load_models(parse_into(FitCLIConfig, ["--smplh-root",
                                                   cfg.smplh_root]))
    seq_dirs = _load_seq_dirs(cfg.results)
    print(f"[fit-eval] {len(seq_dirs)} sequences under {cfg.results}")

    tables = {}
    for stage in cfg.stages.split(","):
        table = evaluate_stage(stage.strip(), seq_dirs, models.body,
                               cfg.mode)
        if not table:
            continue
        tables[stage] = table
        path = os.path.join(out_dir, f"{stage}_mean.csv")
        M.write_csv(path, table)
        print(f"[fit-eval] wrote {path}")
        if "joints3d_all" in table:
            print(f"  {stage}: MPJPE "
                  f"{table['joints3d_all']['mean']*1000:.1f}mm")

    if cfg.qual:
        render_qual([s.strip() for s in cfg.stages.split(",")],
                    seq_dirs[: cfg.qual_max_seqs], models.body, out_dir,
                    fps=cfg.qual_fps)

    # cross-stage comparison table (reference compare_mean.csv)
    if len(tables) > 1:
        import csv

        metrics = sorted({m for t in tables.values() for m in t})
        with open(os.path.join(out_dir, "compare_mean.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["metric"] + list(tables))
            for m in metrics:
                w.writerow([m] + [
                    tables[s].get(m, {}).get(
                        "mean", tables[s].get(m, {}).get("frac", ""))
                    for s in tables])
        print(f"[fit-eval] wrote compare_mean.csv")
    return tables


if __name__ == "__main__":
    from humor_tpu.utils.platform import setup_platform

    setup_platform()
    main()
