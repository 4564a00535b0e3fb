"""AMASS training dataset: processed npz sequences -> batched world-frame
windows, feeding the on-device canonicalization in humor_tpu.data.windows.

Behavioral parity target: /root/reference/humor/datasets/
amass_discrete_dataset.py (split modes :135-277, per-window sampling and
return configs :291-345, input noise :655-656).

TPU-first pipeline split (the reference does everything per-item in
DataLoader worker processes):
  host   : flat float32 sequence store + native threaded window gather
           (humor_tpu.native) — pure memcpy bandwidth;
  device : one jitted `window_to_pairs` per *batch* does all per-step
           canonicalization and rotation conversion.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from humor_tpu import native
from humor_tpu.body_model import constants as C
from humor_tpu.models.state import DATA_NAMES, data_dim

# packed frame layout: every component in DATA_NAMES order, mat rotations
_FRAME_LAYOUT: List[Tuple[str, int]] = [
    (name, data_dim(name, 9)) for name in DATA_NAMES]
FRAME_DIM = sum(d for _, d in _FRAME_LAYOUT)

_GENDER_IDS = {"male": 0, "female": 1, "neutral": 2}


def _offsets_of(layout):
    out, s = {}, 0
    for name, d in layout:
        out[name] = (s, s + d)
        s += d
    return out


_FRAME_OFFSETS = _offsets_of(_FRAME_LAYOUT)


def pack_frames(seq: Dict[str, np.ndarray]) -> np.ndarray:
    """Processed-sequence dict -> (N, FRAME_DIM) packed float32 frames.
    Rotations are converted aa -> mat here, once, at load time."""
    from humor_tpu.ops import transforms
    import jax.numpy as jnp

    N = seq["trans"].shape[0]
    root_mat = np.asarray(transforms.aa_to_rotmat(jnp.asarray(
        seq["root_orient"].astype(np.float32)))).reshape(N, 9)
    pose_mat = np.asarray(transforms.aa_to_rotmat(jnp.asarray(
        seq["pose_body"].reshape(N, -1, 3).astype(np.float32)))
    ).reshape(N, -1)

    def _fit(x, width):
        """Zero-pad / truncate to the fixed frame layout (synthetic test
        bodies expose fewer than 43 keypoint verts)."""
        x = x.reshape(N, -1)
        if x.shape[1] < width:
            x = np.concatenate(
                [x, np.zeros((N, width - x.shape[1]), x.dtype)], axis=1)
        return x[:, :width]

    comp = {
        "trans": seq["trans"],
        "trans_vel": seq["trans_vel"],
        "root_orient": root_mat,
        "root_orient_vel": seq["root_orient_vel"],
        "pose_body": pose_mat,
        "pose_body_vel": seq["pose_body_vel"].reshape(N, -1),
        "joints": seq["joints"].reshape(N, -1),
        "joints_vel": seq["joints_vel"].reshape(N, -1),
        "joints_orient_vel": seq["joint_orient_vel_seq"].reshape(N, 1),
        "verts": _fit(seq["mojo_verts"], C.NUM_KEYPT_VERTS * 3),
        "verts_vel": _fit(seq["mojo_verts_vel"], C.NUM_KEYPT_VERTS * 3),
        # store only the 9 contact-joint entries (reference CONTACT_INDS)
        "contacts": seq["contacts"][:, np.asarray(C.CONTACT_INDS)],
    }
    out = np.empty((N, FRAME_DIM), np.float32)
    for name, (s, e) in _FRAME_OFFSETS.items():
        out[:, s:e] = comp[name].astype(np.float32)
    return out


def unpack_frames(frames: np.ndarray) -> Dict[str, np.ndarray]:
    """(..., FRAME_DIM) -> typed component dict (views, no copies)."""
    return {name: frames[..., s:e]
            for name, (s, e) in _FRAME_OFFSETS.items()}


@dataclass
class AmassDataset:
    """Flat store over all sequences + metadata tables."""

    store: np.ndarray       # (total_frames, FRAME_DIM)
    offsets: np.ndarray     # (S,) int64 row offsets
    lengths: np.ndarray     # (S,) int64 frame counts
    betas: np.ndarray       # (S, 16)
    gender_ids: np.ndarray  # (S,) int32
    paths: List[str]
    fps: float = 30.0

    @property
    def num_seqs(self) -> int:
        return len(self.lengths)

    @property
    def total_frames(self) -> int:
        return int(self.lengths.sum())

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_processed(seqs: Sequence[Dict[str, np.ndarray]],
                       paths: Optional[List[str]] = None) -> "AmassDataset":
        packed = [pack_frames(s) for s in seqs]
        lengths = np.asarray([p.shape[0] for p in packed], np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(
            np.int64)
        betas = np.stack([np.asarray(s["betas"], np.float32)[:C.BETA_SIZE]
                          for s in seqs])
        gender = np.asarray(
            [_GENDER_IDS.get(str(s.get("gender", "neutral")), 2)
             for s in seqs], np.int32)
        fps = float(np.asarray(seqs[0]["fps"])) if seqs else 30.0
        return AmassDataset(np.concatenate(packed), offsets, lengths,
                            betas, gender, paths or [], fps)

    @staticmethod
    def from_npz_files(paths: Sequence[str]) -> "AmassDataset":
        seqs = [dict(np.load(p, allow_pickle=True)) for p in paths]
        return AmassDataset.from_processed(seqs, list(paths))

    # -- sampling ----------------------------------------------------------

    def sample_windows(self, seed: int, batch: int, window_frames: int,
                       noise_std: float = 0.0
                       ) -> Tuple[Dict[str, np.ndarray],
                                  Dict[str, np.ndarray]]:
        """Draw a batch of world-frame windows.

        Returns (world, meta): world components (B, W, D) float32 with
        matrix rotations; meta {betas (B, 16), gender_ids (B,)}.
        """
        seq_idx, start = native.sample_windows(self.lengths, window_frames,
                                               seed, batch)
        frames = native.gather_windows(self.store, self.offsets, seq_idx,
                                       start, window_frames,
                                       noise_std=noise_std, seed=seed + 1)
        world = unpack_frames(frames)
        meta = {
            "betas": native.gather_rows(self.betas, seq_idx),
            "gender_ids": self.gender_ids[seq_idx],
            "seq_idx": seq_idx,
            "start": start,
        }
        return world, meta

    def sequence(self, i: int) -> Dict[str, np.ndarray]:
        """Full world-frame sequence i (components (N, D))."""
        s = int(self.offsets[i])
        e = s + int(self.lengths[i])
        return unpack_frames(self.store[s:e])


def split_files(paths: Sequence[str], split_by: str = "dataset",
                fractions: Tuple[float, float, float] = (0.8, 0.1, 0.1),
                seed: int = 42) -> Dict[str, List[str]]:
    """Partition processed files into train/val/test by unit
    (reference amass_discrete_dataset.py:135-277 split modes):
      'sequence' — each npz file is a unit;
      'subject'  — all files of data_root/<dataset>/<subject> together;
      'dataset'  — whole mocap datasets together (the HuMoR paper split
                   uses fixed dataset lists; use amass.TRAIN/VAL/TEST_
                   DATASETS for that instead of fractions).
    """
    import numpy as _np

    if split_by == "single":
        return {"train": list(paths), "val": list(paths),
                "test": list(paths)}
    if split_by == "sequence":
        units = {p: p for p in paths}
    elif split_by == "subject":
        units = {p: os.path.dirname(p) for p in paths}
    elif split_by == "dataset":
        units = {p: os.path.dirname(os.path.dirname(p)) for p in paths}
    else:
        raise ValueError(f"unknown split_by {split_by!r}")

    keys = sorted(set(units.values()))
    rng = _np.random.RandomState(seed)
    rng.shuffle(keys)
    n = len(keys)
    n_train = max(1, int(fractions[0] * n))
    n_val = max(1 if n > 2 else 0, int(fractions[1] * n))
    train_keys = set(keys[:n_train])
    val_keys = set(keys[n_train:n_train + n_val])
    out = {"train": [], "val": [], "test": []}
    for p in paths:
        k = units[p]
        split = ("train" if k in train_keys
                 else "val" if k in val_keys else "test")
        out[split].append(p)
    return out


def find_processed_files(data_root: str,
                         datasets: Optional[Sequence[str]] = None,
                         split_by: str = "dataset",
                         custom_split: Optional[Sequence[str]] = None,
                         ) -> List[str]:
    """Enumerate processed npz files under data_root/<dataset>/<subject>/
    <seq>_<N>_frames_<fps>_fps.npz (reference split modes
    amass_discrete_dataset.py:135-277: 'dataset' selects whole mocap
    datasets, 'subject'/'sequence'/'single' select finer granularities via
    custom_split path fragments)."""
    if datasets is None:
        datasets = sorted(os.listdir(data_root)) if os.path.isdir(
            data_root) else []
    paths: List[str] = []
    for ds in datasets:
        paths.extend(sorted(glob.glob(
            os.path.join(data_root, ds, "*", "*_frames_*_fps.npz"))))
    if custom_split:
        paths = [p for p in paths
                 if any(frag in p for frag in custom_split)]
    return paths
