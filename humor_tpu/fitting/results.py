"""Fitting result I/O: per-stage npz saves and multi-window stitching.

Behavioral parity target: /root/reference/humor/fitting/fitting_utils.py
(save_optim_result :274-395 — per-sequence npz for stage results, GT, and
observations; save_rgb_stitched_result :398-523 — de-overlap + concat of
sub-sequence windows into one full-video result).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _np(v):
    return np.asarray(v)


def save_stage_results(out_dir: str, stage_name: str,
                       results: Dict[str, np.ndarray],
                       batch_names: Optional[Sequence[str]] = None) -> None:
    """Save one stage's per-sequence results: out_dir/<seq>/<stage>_results
    .npz with keys betas/trans/root_orient/pose_body (+contacts/floor)."""
    B = _np(results["trans"]).shape[0]
    names = batch_names or [f"seq_{i:03d}" for i in range(B)]
    for b, name in enumerate(names):
        seq_dir = os.path.join(out_dir, name)
        os.makedirs(seq_dir, exist_ok=True)
        save = {k: _np(v)[b] for k, v in results.items()
                if hasattr(v, "shape") and _np(v).shape[:1] == (B,)}
        np.savez(os.path.join(seq_dir, f"{stage_name}_results.npz"), **save)


def save_observations(out_dir: str, observed: Dict[str, np.ndarray],
                      gt: Optional[Dict[str, np.ndarray]] = None,
                      batch_names: Optional[Sequence[str]] = None) -> None:
    """Persist the observations (and GT when known) beside the results."""
    ref = next(v for v in observed.values() if hasattr(v, "shape"))
    B = _np(ref).shape[0]
    names = batch_names or [f"seq_{i:03d}" for i in range(B)]
    for b, name in enumerate(names):
        seq_dir = os.path.join(out_dir, name)
        os.makedirs(seq_dir, exist_ok=True)
        obs = {k: _np(v)[b] for k, v in observed.items()
               if hasattr(v, "shape") and _np(v).shape[:1] == (B,)}
        np.savez(os.path.join(seq_dir, "observations.npz"), **obs)
        if gt is not None:
            g = {k: _np(v)[b] for k, v in gt.items()
                 if v is not None and hasattr(v, "shape")
                 and _np(v).shape[:1] == (B,)}
            np.savez(os.path.join(seq_dir, "gt_results.npz"), **g)


def stitch_windows(results: Dict[str, np.ndarray],
                   seq_intervals: np.ndarray) -> Dict[str, np.ndarray]:
    """De-overlap and concatenate a batch of overlapping sub-sequence
    windows into one full sequence (reference save_rgb_stitched_result
    :398-523). results components (B, T, ...); seq_intervals (B, 2)
    [start, end) frame labels. Overlapping frames are taken from the LATER
    window (the reference keeps the newest estimate)."""
    B, T = _np(results["trans"]).shape[:2]
    iv = np.asarray(seq_intervals)
    total = int(iv[-1, 1] - iv[0, 0])
    out: Dict[str, np.ndarray] = {}
    for k, v in results.items():
        v = _np(v)
        if v.ndim < 2 or v.shape[:2] != (B, T):
            # per-window quantities (betas, floor): average
            if v.ndim >= 1 and v.shape[0] == B:
                out[k] = v.mean(axis=0)
            continue
        full = np.zeros((total,) + v.shape[2:], v.dtype)
        for b in range(B):
            s = int(iv[b, 0] - iv[0, 0])
            full[s: s + T] = v[b]
        out[k] = full
    return out
