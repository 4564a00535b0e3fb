"""AMASS cleanup: move out known-bad sequences before training.

Behavioral parity target: /root/reference/humor/scripts/cleanup_amass_data.py
— treadmill sequences (BioMotionLab_NTroje `treadmill_*` / `normal_*`) and
ice-skating (MPI_HDM05 `dg/HDM_dg_07-01*`) violate the static-floor
assumption and are moved aside (not deleted).

Usage: python -m humor_tpu.data.cleanup_amass --data-path ./data/amass_processed
"""

from __future__ import annotations

import fnmatch
import os
import shutil
from dataclasses import dataclass
from typing import List, Tuple

# (dataset, subject glob, sequence-file glob)
BAD_PATTERNS: List[Tuple[str, str, str]] = [
    ("BioMotionLab_NTroje", "*", "*treadmill_*"),
    ("BioMotionLab_NTroje", "*", "*normal_*"),
    ("MPI_HDM05", "dg", "HDM_dg_07-01*"),
]


def find_bad_sequences(data_root: str) -> List[str]:
    out = []
    for dataset, subj_glob, seq_glob in BAD_PATTERNS:
        ds_dir = os.path.join(data_root, dataset)
        if not os.path.isdir(ds_dir):
            continue
        for subj in os.listdir(ds_dir):
            if not fnmatch.fnmatch(subj, subj_glob):
                continue
            subj_dir = os.path.join(ds_dir, subj)
            if not os.path.isdir(subj_dir):
                continue
            for f in os.listdir(subj_dir):
                if fnmatch.fnmatch(f, seq_glob):
                    out.append(os.path.join(subj_dir, f))
    return sorted(out)


def cleanup(data_root: str, backup_dir: str = None) -> List[str]:
    """Move matching sequences to the backup directory (default
    <data_root>/_removed/), preserving the dataset/subject layout — the
    reference's --backup semantics (cleanup_amass_data.py). Returns
    moved paths."""
    backup_dir = backup_dir or os.path.join(data_root, "_removed")
    moved = []
    for path in find_bad_sequences(data_root):
        rel = os.path.relpath(path, data_root)
        dst = os.path.join(backup_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(path, dst)
        moved.append(path)
    return moved


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="humor-cleanup-amass")
    p.add_argument("--data-path", required=True)
    p.add_argument("--backup", default="",
                   help="where removed sequences are saved (reference "
                        "--backup; default <data-path>/_removed)")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)
    if args.dry_run:
        for f in find_bad_sequences(args.data_path):
            print(f)
    else:
        moved = cleanup(args.data_path, args.backup or None)
        dest = args.backup or "_removed/"
        print(f"moved {len(moved)} sequences to {dest}")


if __name__ == "__main__":
    main()
