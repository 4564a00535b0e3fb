"""AMASS preprocessing CLI: raw AMASS npz tree -> training-ready npz tree.

Behavioral parity target: /root/reference/humor/scripts/process_amass_data.py
(__main__: walks amass_root/<dataset>/<subject>/*_poses.npz, processes in a
worker pool, writes the mirrored tree under out).

Usage:
  python -m humor_tpu.data.process_amass \
      --amass-root ./data/amass_raw --out ./data/amass_processed \
      --smplh-root ./body_models/smplh [--datasets CMU KIT ...]
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class ProcessConfig:
    amass_root: str = "./data/amass_raw"
    out: str = "./data/amass_processed"
    smplh_root: str = "./body_models/smplh"
    datasets: Tuple[str, ...] = ()
    out_fps: int = 30
    workers: int = 4


def enumerate_raw_files(amass_root: str,
                        datasets: Optional[List[str]] = None
                        ) -> List[str]:
    if not datasets:
        from humor_tpu.data.amass import ALL_DATASETS

        datasets = [d for d in ALL_DATASETS
                    if os.path.isdir(os.path.join(amass_root, d))]
    paths: List[str] = []
    for ds in datasets:
        paths.extend(sorted(glob.glob(
            os.path.join(amass_root, ds, "*", "*_poses.npz"))))
    return paths


def _gender_of(raw) -> str:
    g = str(np.asarray(raw.get("gender", "neutral")))
    return g if g in ("male", "female", "neutral") else "neutral"


def process_one(args) -> Optional[str]:
    """Worker: one raw file -> processed npz (None if discarded)."""
    in_path, amass_root, out_root, smplh_root, out_fps = args
    from humor_tpu.body_model import smpl as S
    from humor_tpu.data import amass as A

    raw = dict(np.load(in_path, allow_pickle=True))
    gender = _gender_of(raw)
    model_path = S.find_model_path(smplh_root, gender)
    if os.path.exists(model_path):
        model = S.load_smpl_npz(model_path)
    else:
        model = S.synthetic_smpl_model()
    rel = os.path.relpath(in_path, amass_root)
    out_dir = os.path.join(out_root, os.path.dirname(rel))
    try:
        return A.process_file(model, in_path, out_dir, out_fps=out_fps)
    except Exception as e:  # skip corrupt sequences, keep the run alive
        print(f"[process] FAILED {in_path}: {e}")
        return None


def main(argv=None):
    from humor_tpu.utils.config import parse_into

    cfg = parse_into(ProcessConfig, argv, prog="humor-process-amass")
    files = enumerate_raw_files(cfg.amass_root, list(cfg.datasets) or None)
    print(f"[process] {len(files)} raw sequences under {cfg.amass_root}")
    args = [(f, cfg.amass_root, cfg.out, cfg.smplh_root, cfg.out_fps)
            for f in files]

    done = 0
    if cfg.workers > 1:
        # threads, not processes: the heavy work is the jitted SMPL
        # forward (releases the GIL in XLA) and npz IO
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(cfg.workers) as ex:
            for out in ex.map(process_one, args):
                done += out is not None
    else:
        for a in args:
            done += process_one(a) is not None
    print(f"[process] wrote {done}/{len(files)} sequences to {cfg.out}")
    return done


if __name__ == "__main__":
    from humor_tpu.utils.platform import setup_platform

    setup_platform()
    main()
