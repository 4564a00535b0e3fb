"""Functional MLP with GroupNorm(16)+ReLU — the building block of all three
HuMoR sub-networks (posterior / conditional prior / decoder).

Behavioral parity target: /root/reference/humor/models/humor_model.py:1206-1241
(class MLP). Structure for widths [d_in, h1, ..., hk, d_out]:

    Linear(d_in, h1)
    [GroupNorm(16, h_prev) -> ReLU -> Linear(h_prev [+ skip], h_next)] * k

With `skip_dim > 0`, the last `skip_dim` features of the *input* (HuMoR's
latent z in the decoder) are concatenated to the input of every linear
layer after the first.

TPU-first notes: params are a flat list-of-dicts pytree; the apply fn is
pure and shape-polymorphic over leading batch dims, so the same function is
used under jit, vmap (batched TTO) and scan (rollout). Matmuls hit the MXU;
GroupNorm fuses into the surrounding elementwise ops under XLA.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

GN_GROUPS = 16
GN_EPS = 1e-5  # torch GroupNorm default, kept for checkpoint parity


def init_mlp(key: jax.Array, widths: Sequence[int], skip_dim: int = 0,
             dtype=jnp.float32) -> List[dict]:
    """Initialize params. `widths` = [d_in, h1, ..., d_out].

    Init matches torch.nn.Linear defaults (uniform +-1/sqrt(fan_in)) so that
    training dynamics are comparable to the reference.
    """
    params: List[dict] = []
    d_in = widths[0]
    prev = d_in
    n_layers = len(widths) - 1
    keys = jax.random.split(key, n_layers)
    for i, (k, width) in enumerate(zip(keys, widths[1:])):
        fan_in = prev if i == 0 else prev + skip_dim
        bound = 1.0 / jnp.sqrt(fan_in)
        kw, kb = jax.random.split(k)
        layer = {
            "w": jax.random.uniform(kw, (fan_in, width), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (width,), dtype, -bound, bound),
        }
        if i > 0:
            # GroupNorm over the previous layer's output
            layer["gn_scale"] = jnp.ones((prev,), dtype)
            layer["gn_bias"] = jnp.zeros((prev,), dtype)
        params.append(layer)
        prev = width
    return params


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               groups: int = GN_GROUPS, eps: float = GN_EPS) -> jnp.ndarray:
    """GroupNorm over the last axis with per-feature affine.

    Group statistics are computed with a one-hot group-indicator matmul
    instead of a (..., groups, C/groups) reshape: splitting the minor
    (lane) dimension is an unsupported shape cast in Mosaic, and this
    function traces inside the Pallas fused-rollout kernel. The matmuls
    run at fp32 MXU precision, so the result matches the reshape
    formulation to f32 summation-order accuracy (~1e-7)."""
    *batch, C = x.shape
    per = C // groups
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    G = (ci // per == gi).astype(x.dtype)          # (C, groups) one-hot
    hi = jax.lax.Precision.HIGHEST
    # per-group mean, broadcast back to channels: (x @ G) sums each
    # group, @ G.T scatters the group value to its channels
    mean = jnp.dot(jnp.dot(x, G, precision=hi), G.T, precision=hi) / per
    cent = x - mean
    var = jnp.dot(jnp.dot(cent * cent, G, precision=hi), G.T,
                  precision=hi) / per
    return cent * jax.lax.rsqrt(var + eps) * scale + bias


def mlp_apply(params: List[dict], x: jnp.ndarray,
              skip_dim: int = 0,
              compute_dtype: Optional[str] = None) -> jnp.ndarray:
    """Apply the MLP. x: (..., d_in). Returns (..., d_out).

    `compute_dtype` (e.g. "bfloat16") casts matmul *inputs* only — weights
    and activations enter the MXU in the low precision, halving HBM weight
    traffic, while accumulation and everything between matmuls (GroupNorm
    statistics, bias add, ReLU) stay in the params dtype via
    `preferred_element_type`. None = full-precision matmuls."""
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    skip = x[..., x.shape[-1] - skip_dim:] if skip_dim > 0 else None
    h = x
    for i, layer in enumerate(params):
        if i > 0:
            h = group_norm(h, layer["gn_scale"], layer["gn_bias"])
            h = jax.nn.relu(h)
            if skip is not None:
                h = jnp.concatenate([h, skip], axis=-1)
        w, b = layer["w"], layer["b"]
        if cdt is not None:
            h = jnp.matmul(h.astype(cdt), w.astype(cdt),
                           preferred_element_type=b.dtype) + b
        else:
            h = h @ w + b
    return h
