"""Training statistics tracking.

Parity target: /root/reference/humor/utils/stats.py (AverageMeter,
VectorMeter, StatTracker with progress/ETA printing). TensorBoard is
optional — scalars are always mirrored to a JSONL file so runs are
inspectable without TF installed.

TPU-first note: updates accept whole stats dicts of device scalars and
fetch them in one host transfer per step, never per-stat (.cpu().item()
per stat per iter is a known reference perf sink — SURVEY.md §3 end).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class VectorMeter:
    def __init__(self):
        self.vals = []

    def reset(self):
        self.vals = []

    def update(self, arr):
        self.vals.append(np.asarray(arr).reshape(-1))

    def _cat(self):
        return (np.concatenate(self.vals) if self.vals
                else np.zeros((0,), np.float32))

    def mean(self):
        return float(self._cat().mean()) if self.vals else 0.0

    def std(self):
        return float(self._cat().std()) if self.vals else 0.0

    def median(self):
        return float(np.median(self._cat())) if self.vals else 0.0


class StatTracker:
    """Accumulates per-step stats dicts; periodic printing with ETA;
    JSONL mirror; optional TensorBoard."""

    def __init__(self, out_dir: Optional[str] = None,
                 use_tensorboard: bool = False):
        self.meters: Dict[str, AverageMeter] = {}
        self.out_dir = out_dir
        self.jsonl = None
        self.tb = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.jsonl = open(os.path.join(out_dir, "stats.jsonl"), "a")
        if use_tensorboard and out_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(out_dir)
            except Exception:
                self.tb = None
        self._t0 = time.time()
        self._steps = 0

    def update(self, stats: Dict, n: int = 1, global_step: int = 0):
        # one host transfer for the whole dict
        host = jax.device_get(stats)
        for k, v in host.items():
            v = float(np.asarray(v))
            self.meters.setdefault(k, AverageMeter()).update(v, n)
            if self.tb is not None:
                self.tb.add_scalar(k, v, global_step)
        if self.jsonl is not None:
            rec = {k: float(np.asarray(v)) for k, v in host.items()}
            rec["step"] = int(global_step)
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        self._steps += 1

    def averages(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self):
        for m in self.meters.values():
            m.reset()
        self._t0 = time.time()
        self._steps = 0

    def progress_str(self, step: int, total: int) -> str:
        el = time.time() - self._t0
        per = el / max(self._steps, 1)
        eta = per * (total - step)
        core = " ".join(f"{k}={m.avg:.5f}" for k, m in
                        sorted(self.meters.items()))
        return (f"[{step}/{total}] {core} | {per:.3f}s/it eta {eta/60:.1f}m")
