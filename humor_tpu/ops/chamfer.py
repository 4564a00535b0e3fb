"""Nearest-neighbor / Chamfer distance for point-cloud fitting losses.

The reference implements this as a CUDA extension with a custom autograd
function (/root/reference/humor/utils/chamfer_distance/: brute-force
bidirectional NN with 512-point shared-memory tiles, used one-way by the
point-cloud energy at fitting_loss.py:378-396 with N=4096 observed points
vs M=6890 SMPL vertices per frame).

TPU-native design (new implementation, not a port):
  * the distance matrix decomposes as |x|^2 + |y|^2 - 2 x.y^T — the cross
    term is an MXU matmul, so the Pallas kernel tiles (N, M) into
    (TN, TM) blocks, computes each block with `pl.dot`, and keeps a
    running (min, argmin) over the M tiles in the revisited output block
    (grid (B, N/TN, M/TM), M innermost);
  * gradients do not need the matrix: d/dx |x - y_nn|^2 = 2 (x - y_nn)
    with y_nn gathered by the argmin index, and the y-gradient is a
    segment-sum scatter — both cheap XLA ops, expressed as a custom VJP
    so reverse-mode never materializes (N, M);
  * a pure-jnp path provides the CPU fallback and the parity oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# tile sizes: BB*TN*TM*4B = 2MB distance tile in VMEM. BB=8 batch rows per
# block satisfies the TPU sublane tiling rule (second-to-last block dim
# must be a multiple of 8) for the (B, N) outputs.
_BB = 8
_TN = 128
_TM = 512
_PAD_VAL = 1e6  # padded points sit 1e6 away -> squared dist 1e12 << f32 max


_CHUNK_M = 2048


def _nn_jnp(xyz1: jnp.ndarray, xyz2: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA formulation: (B, N, 3), (B, M, 3) -> dist (B, N), idx (B, N).

    Scans over M in chunks with a running (min, argmin) so peak memory is
    O(B*N*chunk) instead of O(B*N*M) — the reference PROX workload's full
    matrix (120 x 4096 x 6890 f32) would not fit in HBM inside the
    jitted L-BFGS stages."""
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    sq1 = jnp.sum(xyz1 * xyz1, axis=-1)  # (B, N)

    # dense is ~5x faster (XLA fuses matmul+argmin without the scan's
    # serialization) as long as the (B, N, M) matrix fits comfortably
    if M <= _CHUNK_M or B * N * M * 4 <= 2 ** 31:
        sq2 = jnp.sum(xyz2 * xyz2, axis=-1)
        cross = jnp.einsum("bnc,bmc->bnm", xyz1, xyz2, precision=_HI)
        d = sq1[..., None] + sq2[..., None, :] - 2.0 * cross
        idx = jnp.argmin(d, axis=-1)
        dist = jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
        return jnp.maximum(dist, 0.0), idx.astype(jnp.int32)

    m_pad = (-M) % _CHUNK_M
    y = jnp.pad(xyz2, ((0, 0), (0, m_pad), (0, 0)),
                constant_values=_PAD_VAL)
    n_chunks = y.shape[1] // _CHUNK_M
    y_chunks = y.reshape(B, n_chunks, _CHUNK_M, 3).swapaxes(0, 1)

    def body(carry, yc):
        best_d, best_i, off = carry
        sq2 = jnp.sum(yc * yc, axis=-1)
        cross = jnp.einsum("bnc,bmc->bnm", xyz1, yc, precision=_HI)
        d = sq1[..., None] + sq2[..., None, :] - 2.0 * cross
        i = jnp.argmin(d, axis=-1)
        dm = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
        take = dm < best_d
        best_d = jnp.where(take, dm, best_d)
        best_i = jnp.where(take, i.astype(jnp.int32) + off, best_i)
        return (best_d, best_i, off + _CHUNK_M), None

    init = (jnp.full((B, N), jnp.inf, xyz1.dtype),
            jnp.zeros((B, N), jnp.int32), jnp.asarray(0, jnp.int32))
    (dist, idx, _), _ = jax.lax.scan(body, init, y_chunks)
    return jnp.maximum(dist, 0.0), idx


def _nn_pallas(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
               interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled Pallas TPU kernel: running min/argmin over M tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    b_pad = (-B) % _BB
    n_pad = (-N) % _TN
    m_pad = (-M) % _TM
    Bp, Np, Mp = B + b_pad, N + n_pad, M + m_pad
    # padded query points/batches produce valid (discarded) rows; padded
    # reference points sit far away so they never win the min
    x = jnp.pad(xyz1, ((0, b_pad), (0, n_pad), (0, 0)))
    y = jnp.pad(xyz2, ((0, b_pad), (0, m_pad), (0, 0)),
                constant_values=_PAD_VAL)

    grid = (Bp // _BB, Np // _TN, Mp // _TM)

    def kernel(x_ref, y_ref, dist_ref, idx_ref):
        j = pl.program_id(2)
        xt = x_ref[...]  # (BB, TN, 3)
        yt = y_ref[...]  # (BB, TM, 3)
        sqx = jnp.sum(xt * xt, axis=-1)[:, :, None]          # (BB, TN, 1)
        sqy = jnp.sum(yt * yt, axis=-1)[:, None, :]          # (BB, 1, TM)
        cross = jax.lax.dot_general(
            xt, yt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (BB, TN, TM)
        # full f32 precision: the MXU's default bf16 input truncation
        # perturbs distances by ~1e-2, flipping argmins near ties
        d = sqx + sqy - 2.0 * cross
        tile_min = jnp.min(d, axis=2)                         # (BB, TN)
        tile_arg = jnp.argmin(d, axis=2).astype(jnp.int32) + j * _TM

        @pl.when(j == 0)
        def _():
            dist_ref[...] = tile_min
            idx_ref[...] = tile_arg

        @pl.when(j > 0)
        def _():
            prev = dist_ref[...]
            take = tile_min < prev
            dist_ref[...] = jnp.where(take, tile_min, prev)
            idx_ref[...] = jnp.where(take, tile_arg, idx_ref[...])

    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BB, _TN, 3), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, _TM, 3), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BB, _TN), lambda b, i, j: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, _TN), lambda b, i, j: (b, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * Mp * 3,
            bytes_accessed=Bp * (Np + Mp) * 12 + Bp * Np * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, y)
    return jnp.maximum(dist[:B, :N], 0.0), idx[:B, :N]


def _use_pallas() -> bool:
    """Measured on a TPU chip at the PROX workload (60 x 4096 x 6890),
    XLA's fused dense formulation (matmul + min, never materializing the
    full matrix thanks to fusion) beats the hand-tiled kernel ~3x — with
    K=3 the MXU is bandwidth-bound and the kernel's grid revisits
    dominate. The Pallas kernel stays available (HUMOR_CHAMFER=pallas)
    for clouds too large for XLA's fusion to keep on-chip."""
    import os

    return (os.environ.get("HUMOR_CHAMFER") == "pallas"
            and jax.default_backend() == "tpu")


@jax.custom_vjp
def nn_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-way squared NN distances: for each point in xyz1 (B, N, 3), the
    squared distance to (and index of) its nearest neighbor in xyz2
    (B, M, 3). Returns (dist (B, N), idx (B, N) int32). Differentiable in
    both point sets (idx has zero cotangent).
    """
    if _use_pallas():
        return _nn_pallas(xyz1, xyz2)
    return _nn_jnp(xyz1, xyz2)


def _nn_fwd(xyz1, xyz2):
    dist, idx = nn_distance(xyz1, xyz2)
    return (dist, idx), (xyz1, xyz2, idx)


def _nn_bwd(res, cots):
    xyz1, xyz2, idx = res
    g_dist = cots[0]  # (B, N); idx cotangent ignored (integer output)
    nn = jnp.take_along_axis(xyz2, idx[..., None], axis=1)  # (B, N, 3)
    diff = 2.0 * (xyz1 - nn) * g_dist[..., None]
    # scatter-add -diff into the argmin rows of xyz2
    g2 = jnp.zeros_like(xyz2)
    g2 = g2.at[jnp.arange(xyz2.shape[0])[:, None], idx].add(-diff)
    return diff, g2


nn_distance.defvjp(_nn_fwd, _nn_bwd)


def chamfer_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional squared NN distances (reference ChamferDistance
    call signature, chamfer_distance.py:57-60): returns
    (dist1 (B, N), dist2 (B, M))."""
    d1, _ = nn_distance(xyz1, xyz2)
    d2, _ = nn_distance(xyz2, xyz1)
    return d1, d2
