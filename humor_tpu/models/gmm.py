"""Initial-state Gaussian-mixture prior.

The TTO pipeline scores the optimized frame-0 body state (138-d: joints 66
+ joints_vel 66 + trans_vel 3 + root_orient_vel 3) under a GMM fit to the
training set's initial states.

Behavioral parity target: /root/reference/humor/train/train_state_prior.py
(sklearn GaussianMixture(12, full) fit :99-113, npz persistence :123,
torch MixtureSameFamily log_prob rebuild :139-143; the same npz is consumed
at /root/reference/humor/fitting/fitting_loss.py:85-89).

TPU-first design: the fit itself is a jit-able full-batch EM over one
dense (N, D) array — responsibilities, means, and covariances are all MXU
einsums, and each EM sweep is one `lax.scan` step so the whole fit is a
single compiled program (the reference shells out to sklearn on CPU).
`log_prob` is a pure function used inside the jitted fitting losses.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


class GmmParams(NamedTuple):
    weights: jnp.ndarray  # (K,)
    means: jnp.ndarray    # (K, D)
    covs: jnp.ndarray     # (K, D, D) full covariances

    @property
    def num_components(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[-1]


def save_npz(path: str, gmm: GmmParams) -> None:
    """Same npz schema as the reference (train_state_prior.py:123)."""
    np.savez(path,
             weights=np.asarray(gmm.weights),
             means=np.asarray(gmm.means),
             covariances=np.asarray(gmm.covs))


def load_npz(path: str, dtype=jnp.float32) -> GmmParams:
    raw = np.load(path)
    return GmmParams(
        weights=jnp.asarray(raw["weights"], dtype),
        means=jnp.asarray(raw["means"], dtype),
        covs=jnp.asarray(raw["covariances"], dtype),
    )


def _chol_terms(gmm: GmmParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cholesky factors and log-determinants of the component covariances."""
    chol = jnp.linalg.cholesky(gmm.covs)  # (K, D, D)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)  # (K,)
    return chol, logdet


def component_log_prob(gmm: GmmParams, x: jnp.ndarray) -> jnp.ndarray:
    """Per-component Gaussian log-density: x (..., D) -> (..., K)."""
    chol, logdet = _chol_terms(gmm)
    D = gmm.dim
    diff = x[..., None, :] - gmm.means  # (..., K, D)
    # y = L^{-1} diff via a precomputed inverse factor -> one batched einsum
    # (an MXU matmul) instead of a per-point triangular solve
    eye = jnp.broadcast_to(jnp.eye(D, dtype=chol.dtype),
                           (gmm.num_components, D, D))
    chol_inv = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    y = jnp.einsum("kij,...kj->...ki", chol_inv, diff, precision=_HI)
    maha = jnp.sum(y * y, axis=-1)  # (..., K)
    return -0.5 * (maha + logdet + D * jnp.log(2.0 * jnp.pi))


def log_prob(gmm: GmmParams, x: jnp.ndarray) -> jnp.ndarray:
    """Mixture log-density: x (..., D) -> (...)."""
    comp = component_log_prob(gmm, x)  # (..., K)
    return jax.scipy.special.logsumexp(
        comp + jnp.log(gmm.weights), axis=-1)


def sample(gmm: GmmParams, key: jax.Array, shape=()) -> jnp.ndarray:
    """Draw samples (..., D) from the mixture."""
    kc, kn = jax.random.split(key)
    comps = jax.random.categorical(
        kc, jnp.log(gmm.weights), shape=shape)  # (...)
    chol = jnp.linalg.cholesky(gmm.covs)
    eps = jax.random.normal(kn, (*shape, gmm.dim), gmm.means.dtype)
    mean = gmm.means[comps]              # (..., D)
    L = chol[comps]                      # (..., D, D)
    return mean + jnp.einsum("...ij,...j->...i", L, eps, precision=_HI)


# ---------------------------------------------------------------------------
# Full-batch EM fit
# ---------------------------------------------------------------------------

def _kmeanspp_init(key: jax.Array, data: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding of the component means (one pass, jit-able)."""
    n = data.shape[0]
    k0, key = jax.random.split(key)
    first = data[jax.random.randint(k0, (), 0, n)]

    def pick(carry, subkey):
        means, count = carry
        d2 = jnp.min(
            jnp.sum((data[:, None, :] - means[None]) ** 2, axis=-1)
            + jnp.where(jnp.arange(means.shape[0]) < count, 0.0, jnp.inf),
            axis=-1)
        idx = jax.random.categorical(subkey, jnp.log(d2 + 1e-12))
        means = means.at[count].set(data[idx])
        return (means, count + 1), None

    means0 = jnp.zeros((k, data.shape[1]), data.dtype).at[0].set(first)
    (means, _), _ = jax.lax.scan(pick, (means0, 1), jax.random.split(key, k - 1))
    return means


def fit(key: jax.Array, data: jnp.ndarray, n_components: int = 12,
        n_iters: int = 100, reg_covar: float = 1e-4) -> GmmParams:
    """Full-covariance EM, sklearn-equivalent update rules
    (reference train_state_prior.py:99-113 config: 12 components, full cov).

    data: (N, D) float32. Jit-able; each EM sweep is one scan step.

    The EM runs on per-dimension-whitened data (unit scale) so the float32
    Cholesky stays well-conditioned even for rank-deficient covariances;
    `reg_covar` is the diagonal jitter in *whitened* space (i.e. relative
    to each dimension's variance). Results are returned in original space.
    """
    mu0 = jnp.mean(data, axis=0)
    sd0 = jnp.maximum(jnp.std(data, axis=0), 1e-5)
    data = (data - mu0) / sd0

    n, d = data.shape
    means0 = _kmeanspp_init(key, data, n_components)
    # initial covariance: global data covariance per component
    centered = data - jnp.mean(data, axis=0)
    global_cov = jnp.matmul(centered.T, centered, precision=_HI) / n
    covs0 = jnp.broadcast_to(global_cov, (n_components, d, d)) \
        + reg_covar * jnp.eye(d, dtype=data.dtype)
    w0 = jnp.full((n_components,), 1.0 / n_components, data.dtype)
    gmm0 = GmmParams(w0, means0, covs0.astype(data.dtype))

    eye = jnp.eye(d, dtype=data.dtype)

    def em_step(gmm: GmmParams, _):
        # E: log responsibilities
        logp = component_log_prob(gmm, data) + jnp.log(gmm.weights)  # (N, K)
        lognorm = jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
        resp = jnp.exp(logp - lognorm)  # (N, K)
        # M
        nk = jnp.sum(resp, axis=0) + 1e-10  # (K,)
        means = jnp.matmul(resp.T, data, precision=_HI) / nk[:, None]
        diff = data[:, None, :] - means[None]  # (N, K, D)
        covs = jnp.einsum("nk,nki,nkj->kij", resp, diff, diff,
                          precision=_HI) / nk[:, None, None]
        covs = covs + reg_covar * eye
        weights = nk / n
        ll = jnp.mean(lognorm)
        return GmmParams(weights, means, covs), ll

    gmm, lls = jax.lax.scan(em_step, gmm0, None, length=n_iters)
    # unwhiten back to original space
    return GmmParams(
        weights=gmm.weights,
        means=mu0 + gmm.means * sd0,
        covs=gmm.covs * (sd0[:, None] * sd0[None, :]),
    )


def fit_initial_state_gmm(key: jax.Array, states: jnp.ndarray,
                          n_components: int = 12,
                          n_iters: int = 100) -> GmmParams:
    """Fit the 138-d initial-state prior (reference train_state_prior.py:79-113
    state layout: [joints, joints_vel, trans_vel, root_orient_vel])."""
    return fit(key, states, n_components=n_components, n_iters=n_iters)


def pack_initial_state(state: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Typed frame-0 state -> the GMM's 138-d vector layout
    (reference train_state_prior.py:83-93 order)."""
    return jnp.concatenate(
        [state["joints"], state["joints_vel"], state["trans_vel"],
         state["root_orient_vel"]], axis=-1)
