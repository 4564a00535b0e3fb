"""Device-resident window sampling: stage the packed frame store in HBM
once, then build training batches on device from per-batch index
transfers.

The reference streams batches through torch DataLoader workers
(/root/reference/humor/train/train_humor.py:130-141). The TPU-first
equivalent is not a faster host loader but no per-batch bulk transfer at
all: the flat (total_frames, D) store is staged to the device once, and
each batch moves only the (B,) sampled window indices (~3 KB) before a
single fused gather + noise + canonicalization program builds the
training pairs in HBM. Measured on the tunneled chip in this image the
host->device copy of one contiguous B=800 window batch is ~288 ms
(12.2 MB at ~42 MB/s) against a 129 ms train step — the transfer, not
the gather, is the pipeline cost this removes (RESULTS.md "Training
throughput"). On a co-located host the same design still removes the
loader from the critical path; the HBM cost is `staged_nbytes()` (the
HuMoR training subset of AMASS is a few GB in the staged column subset —
`fits_budget()` guards the auto default).

Window *sampling* stays on host (humor_tpu.native.sample_windows) so the
sampled (sequence, start) distribution is identical to the host path;
only the gather + noise move on device. Additive gaussian noise matches
the host gather's semantics (applied to every channel of the gathered
block, native/window_sampler.cpp) but draws from the JAX PRNG stream
instead of the native one.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu import native
from humor_tpu.data.dataset import _FRAME_OFFSETS, AmassDataset

# components the training pipeline consumes (train/cli.py keep list)
TRAIN_COLUMNS: Tuple[str, ...] = (
    "trans", "trans_vel", "root_orient", "root_orient_vel",
    "pose_body", "joints", "joints_vel", "contacts")

# default HBM budget for auto-staging: leave room for params/optimizer/
# activations on a 16 GB v5e chip
DEFAULT_BUDGET_BYTES = int(float(os.environ.get(
    "HUMOR_DEVICE_DATA_BUDGET", 8e9)))


def _column_layout(columns: Sequence[str]):
    idx, layout, s = [], {}, 0
    for name in columns:
        a, b = _FRAME_OFFSETS[name]
        idx.extend(range(a, b))
        layout[name] = (s, s + (b - a))
        s += b - a
    return np.asarray(idx, np.int64), layout, s


@partial(jax.jit,
         static_argnames=("window_frames", "layout_items", "noise_std"))
def _gather_world(store, rows0, key, *, window_frames: int,
                  layout_items: tuple, noise_std: float):
    """(..., ) start rows -> world dict {name: (..., W, D)} with optional
    additive gaussian noise on every channel (host-gather parity,
    native/window_sampler.cpp). Leading dims pass through, so one
    program serves both per-batch (B,) and k-chunk (k, B) gathers."""
    rows = rows0[..., None] + jnp.arange(window_frames, dtype=rows0.dtype)
    frames = jnp.take(store, rows, axis=0)      # (..., W, D)
    if noise_std > 0.0:
        frames = frames + noise_std * jax.random.normal(
            key, frames.shape, frames.dtype)
    return {name: frames[..., a:b] for name, (a, b) in layout_items}


@dataclass(frozen=True)
class DeviceWindowStore:
    """Column subset of an AmassDataset staged in device memory."""
    store: jnp.ndarray       # (total_frames, D_cols) on device
    betas: jnp.ndarray       # (S, 16) on device
    gender_ids: jnp.ndarray  # (S,) int32 on device (already % 2)
    layout: Dict[str, Tuple[int, int]]
    lengths: np.ndarray      # host, for window sampling
    offsets: np.ndarray      # host row offsets per sequence
    fps: float

    @staticmethod
    def from_dataset(ds: AmassDataset,
                     columns: Sequence[str] = TRAIN_COLUMNS
                     ) -> "DeviceWindowStore":
        idx, layout, _ = _column_layout(columns)
        cols = np.ascontiguousarray(ds.store[:, idx])
        return DeviceWindowStore(
            store=jnp.asarray(cols),
            betas=jnp.asarray(ds.betas),
            gender_ids=jnp.asarray(ds.gender_ids.astype(np.int32) % 2),
            layout=layout, lengths=ds.lengths, offsets=ds.offsets,
            fps=ds.fps)

    @staticmethod
    def staged_nbytes(ds: AmassDataset,
                      columns: Sequence[str] = TRAIN_COLUMNS) -> int:
        _, _, width = _column_layout(columns)
        return int(ds.store.shape[0]) * width * 4

    @staticmethod
    def fits_budget(ds: AmassDataset,
                    columns: Sequence[str] = TRAIN_COLUMNS,
                    budget_bytes: int = DEFAULT_BUDGET_BYTES) -> bool:
        return DeviceWindowStore.staged_nbytes(ds, columns) <= budget_bytes

    def sample_windows(self, seed: int, batch: int, window_frames: int,
                       noise_std: float = 0.0):
        """Host-sampled indices -> device-built (world, meta). world
        components are (B, W, D) device arrays; meta carries device
        betas/gender_ids gathered from the staged per-sequence tables."""
        seq_idx, start = native.sample_windows(
            self.lengths, window_frames, seed, batch)
        idx_dtype = (np.int32 if self.store.shape[0] < 2 ** 31
                     else np.int64)
        rows0 = jnp.asarray((self.offsets[seq_idx] + start)
                            .astype(idx_dtype))
        seq_dev = jnp.asarray(seq_idx.astype(np.int32))
        key = jax.random.PRNGKey(seed + 1)
        world = _gather_world(
            self.store, rows0, key, window_frames=window_frames,
            layout_items=tuple(sorted(self.layout.items())),
            noise_std=float(noise_std))
        meta = {"betas": jnp.take(self.betas, seq_dev, axis=0),
                "gender_ids": jnp.take(self.gender_ids, seq_dev, axis=0)}
        return world, meta

    def sample_window_chunk(self, seeds: Sequence[int], batch: int,
                            window_frames: int, noise_std: float = 0.0):
        """k per-step seeds -> ONE fused (k, B, W, D) gather.

        The k-step dispatch-amortized trainer consumes stacked (k, B, ...)
        chunks (train/step.make_multi_steps); building them as k separate
        sample_windows calls + a device-side stack costs ~34 small
        dispatches per chunk over this image's tunneled link. This fuses
        the whole chunk into one index transfer + one gather program.
        Window sampling still runs per seed on host, so at noise 0 the
        result is bit-identical to stacking k sample_windows(seed_i)
        calls (pinned by tests/test_device_store.py); with noise > 0 the
        chunk draws from one PRNG stream (seeds[0]) instead of k — same
        distribution, different draws."""
        seq_rows = [native.sample_windows(self.lengths, window_frames,
                                          s, batch) for s in seeds]
        seq_idx = np.stack([si for si, _ in seq_rows])      # (k, B)
        start = np.stack([st for _, st in seq_rows])
        idx_dtype = (np.int32 if self.store.shape[0] < 2 ** 31
                     else np.int64)
        rows0 = jnp.asarray((self.offsets[seq_idx] + start)
                            .astype(idx_dtype))
        seq_dev = jnp.asarray(seq_idx.astype(np.int32))
        key = jax.random.PRNGKey(int(seeds[0]) + 1)
        world = _gather_world(
            self.store, rows0, key, window_frames=window_frames,
            layout_items=tuple(sorted(self.layout.items())),
            noise_std=float(noise_std))
        meta = {"betas": jnp.take(self.betas, seq_dev, axis=0),
                "gender_ids": jnp.take(self.gender_ids, seq_dev, axis=0)}
        return world, meta


def maybe_stage(ds: AmassDataset, mode: int = -1,
                columns: Sequence[str] = TRAIN_COLUMNS,
                budget_bytes: int = DEFAULT_BUDGET_BYTES
                ) -> Optional[DeviceWindowStore]:
    """mode 1 = force on, 0 = off, -1 = auto (stage when the column
    subset fits the HBM budget)."""
    if mode == 0:
        return None
    if mode != 1 and not DeviceWindowStore.fits_budget(ds, columns,
                                                       budget_bytes):
        return None
    return DeviceWindowStore.from_dataset(ds, columns)
