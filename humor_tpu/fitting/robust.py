"""Robust residual weighting for fitting energies.

Behavioral parity targets (new jnp implementations):
  /root/reference/humor/fitting/fitting_utils.py:192-215 (apply_robust_weighting)
  /root/reference/humor/fitting/fitting_utils.py:217-231 (robust_std via MAD)
  /root/reference/humor/fitting/fitting_utils.py:233-248 (bisquare weights)
  /root/reference/humor/fitting/fitting_utils.py:250-257 (Geman-McClure)

Jit-safe: medians are jnp.median (sort-based — fine under jit/TPU) and
the outlier cut is a where-select. Gradients never flow through the
weights (stop_gradient), matching the reference's detach.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BISQUARE_TUNE_CONST = 4.6851  # 95% Gaussian efficiency
MAD_TO_STD = 0.67449


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over the last axis restricted to `mask` (bool, same shape),
    keepdims. Jit-safe: inf-fill + sort + interpolated middle gather,
    matching jnp.median's even-count interpolation. Rows with no valid
    entries return 0."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big, axis=-1)
    n = jnp.sum(mask, axis=-1, keepdims=True)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = 0.5 * (jnp.take_along_axis(s, lo, axis=-1)
                 + jnp.take_along_axis(s, hi, axis=-1))
    return jnp.where(n > 0, med, 0.0)


def robust_std(res: jnp.ndarray, mask: jnp.ndarray = None) -> jnp.ndarray:
    """Median-absolute-deviation estimate of std over the last axis.
    res (..., N) -> (..., 1). With `mask`, padded entries are excluded
    from both medians so padding can't inflate (or swamp) the scale —
    the reference avoids this by repeat-padding real points
    (fitting_utils.py:40-57); here visibility is explicit."""
    if mask is None:
        med = jnp.median(res, axis=-1, keepdims=True)
        mad = jnp.median(jnp.abs(res - med), axis=-1, keepdims=True)
    else:
        med = masked_median(res, mask)
        mad = masked_median(jnp.abs(res - med), mask)
    return mad / MAD_TO_STD


def bisquare_robust_weights(res: jnp.ndarray,
                            tune_const: float = BISQUARE_TUNE_CONST,
                            mask: jnp.ndarray = None) -> jnp.ndarray:
    """Tukey bisquare weights over the last axis; zero past the tuning
    cut. Uses |res| in the normalization (fixing the reference's noted
    positive-residual assumption, fitting_utils.py:238-241)."""
    scale = robust_std(res, mask) * tune_const
    norm_res = jnp.abs(res) / jnp.maximum(scale, 1e-12)
    w = jnp.square(1.0 - jnp.square(norm_res))
    return jnp.where(norm_res >= 1.0, 0.0, w)


def apply_robust_weighting(res: jnp.ndarray,
                           robust_loss_type: str = "bisquare",
                           robust_tuning_const: float = BISQUARE_TUNE_CONST,
                           mask: jnp.ndarray = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Robustly weighted squared residuals: returns (w * res^2, w).
    Weights are computed on detached residuals so no gradient flows
    through them. `mask` (bool, same shape as res) restricts the scale
    statistics to visible residuals — required whenever res contains
    sentinel-padded entries."""
    detached = jax.lax.stop_gradient(res)
    if robust_loss_type == "none":
        w = jnp.ones_like(detached)
    elif robust_loss_type == "bisquare":
        w = bisquare_robust_weights(detached, robust_tuning_const, mask)
    else:
        raise ValueError(f"not a valid robust loss: {robust_loss_type!r}")
    return w * jnp.square(res), w


def gmof(res: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman-McClure robustifier: sigma^2 x^2 / (sigma^2 + x^2)."""
    x_sq = jnp.square(res)
    s_sq = sigma * sigma
    return (s_sq * x_sq) / (s_sq + x_sq)
