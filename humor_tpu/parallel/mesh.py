"""Device-mesh helpers: the framework's parallelism is data-parallel
training over the flattened transition batch and window-parallel TTO, both
expressed as shardings over a 1-D `dp` mesh (SURVEY.md §2.9: the model is
~9M params of MLPs — pure DP over ICI is the right decomposition; no
tensor/pipeline parallelism is warranted at this scale).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "dp") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard leading (batch) dim across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp",
                batch_axis_index: int = 0):
    """Device-put a pytree with batch-axis sharding over the mesh.

    batch_axis_index=1 handles k-stacked batches (scan axis 0 replicated,
    per-step batch axis 1 sharded — train.step.make_multi_steps)."""
    spec = P(*([None] * batch_axis_index), axis)
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh)
        if hasattr(x, "ndim") and x.ndim > batch_axis_index else x, tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
