"""Native (C++) host-runtime components, loaded via ctypes.

Build happens lazily on first use with g++ (no pybind11 in this image);
the compiled .so is cached next to the source. Every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "window_sampler.cpp")
_SO = os.path.join(_DIR, "_window_sampler.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", _SO + ".tmp"],
                    check=True, capture_output=True)
                os.replace(_SO + ".tmp", _SO)
            lib = ctypes.CDLL(_SO)
            lib.sample_windows.restype = ctypes.c_int
            lib.sample_windows.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.gather_windows.restype = None
            lib.gather_windows.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_float, ctypes.c_uint64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            lib.gather_rows.restype = None
            lib.gather_rows.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except Exception:
            _build_failed = True
            return None
        return _lib


def native_available() -> bool:
    return _build() is not None


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sample_windows(lengths: np.ndarray, window_len: int, seed: int,
                   batch: int) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform window sampling over all valid (sequence, start) positions.
    Returns (seq_idx (B,), start (B,)) int64."""
    lengths = np.ascontiguousarray(lengths, np.int64)
    lib = _build()
    if lib is not None:
        seq_idx = np.empty(batch, np.int64)
        start = np.empty(batch, np.int64)
        rc = lib.sample_windows(_i64p(lengths), len(lengths), window_len,
                                np.uint64(seed), batch, _i64p(seq_idx),
                                _i64p(start))
        if rc != 0:
            raise ValueError("no sequence long enough for window")
        return seq_idx, start
    # numpy fallback (same distribution, different stream)
    avail = np.maximum(lengths - window_len + 1, 0)
    total = int(avail.sum())
    if total <= 0:
        raise ValueError("no sequence long enough for window")
    rng = np.random.RandomState(seed % (2 ** 31))
    pos = rng.randint(0, total, size=batch)
    cum = np.concatenate([[0], np.cumsum(avail)])
    seq_idx = np.searchsorted(cum, pos, side="right") - 1
    return seq_idx.astype(np.int64), (pos - cum[seq_idx]).astype(np.int64)


def gather_windows(store: np.ndarray, offsets: np.ndarray,
                   seq_idx: np.ndarray, start: np.ndarray,
                   window_len: int, noise_std: float = 0.0,
                   seed: int = 0, num_threads: int = 0) -> np.ndarray:
    """Gather [B, window_len, frame_dim] float32 windows from the flat
    store [total_frames, frame_dim]."""
    store = np.ascontiguousarray(store, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    seq_idx = np.ascontiguousarray(seq_idx, np.int64)
    start = np.ascontiguousarray(start, np.int64)
    B = len(seq_idx)
    D = store.shape[1]
    lib = _build()
    if lib is not None:
        out = np.empty((B, window_len, D), np.float32)
        if num_threads <= 0:
            num_threads = min(8, os.cpu_count() or 1)
        lib.gather_windows(_f32p(store), _i64p(offsets), D,
                           _i64p(seq_idx), _i64p(start), B, window_len,
                           np.float32(noise_std), np.uint64(seed),
                           num_threads, _f32p(out))
        return out
    rows = offsets[seq_idx, None] + start[:, None] + np.arange(window_len)
    out = store[rows]
    if noise_std > 0:
        rng = np.random.RandomState(seed % (2 ** 31))
        out = out + rng.randn(*out.shape).astype(np.float32) * noise_std
    return out


def gather_rows(table: np.ndarray, idx: np.ndarray) -> np.ndarray:
    table = np.ascontiguousarray(table, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    lib = _build()
    if lib is not None:
        out = np.empty((len(idx), table.shape[1]), np.float32)
        lib.gather_rows(_f32p(table), table.shape[1], _i64p(idx),
                        len(idx), _f32p(out))
        return out
    return table[idx]
