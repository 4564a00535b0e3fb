"""GMM initial-state prior: EM fit quality, log_prob parity vs a direct
density computation, npz round trip, sampling sanity.

Mirrors the reference's own cross-check of torch GMM log-probs against
sklearn (/root/reference/humor/train/train_state_prior.py:154-163).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.models import gmm as G


def _two_cluster_data(n=600, d=5, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(n // 2, d) * 0.3 + 3.0
    b = rng.randn(n // 2, d) * 0.5 - 2.0
    return jnp.asarray(np.concatenate([a, b]), jnp.float32)


def test_em_recovers_clusters():
    data = _two_cluster_data()
    gmm = G.fit(jax.random.PRNGKey(0), data, n_components=2, n_iters=60)
    mus = np.sort(np.asarray(gmm.means)[:, 0])
    assert abs(mus[0] - (-2.0)) < 0.2
    assert abs(mus[1] - 3.0) < 0.2
    w = np.asarray(gmm.weights)
    assert np.allclose(w.sum(), 1.0, atol=1e-5)
    assert np.all(w > 0.3)


def test_log_prob_matches_direct_density():
    d, k = 3, 2
    rng = np.random.RandomState(1)
    means = rng.randn(k, d).astype(np.float32)
    A = rng.randn(k, d, d).astype(np.float32) * 0.3
    covs = np.einsum("kij,klj->kil", A, A) + 0.5 * np.eye(d, dtype=np.float32)
    weights = np.asarray([0.3, 0.7], np.float32)
    gmm = G.GmmParams(jnp.asarray(weights), jnp.asarray(means),
                      jnp.asarray(covs))

    x = rng.randn(7, d).astype(np.float32)
    got = np.asarray(G.log_prob(gmm, jnp.asarray(x)))

    # direct density with numpy
    dens = np.zeros(7)
    for i in range(k):
        diff = x - means[i]
        inv = np.linalg.inv(covs[i])
        maha = np.einsum("nd,de,ne->n", diff, inv, diff)
        norm = np.sqrt(((2 * np.pi) ** d) * np.linalg.det(covs[i]))
        dens += weights[i] * np.exp(-0.5 * maha) / norm
    np.testing.assert_allclose(got, np.log(dens), rtol=1e-4, atol=1e-4)


def test_npz_round_trip(tmp_path):
    data = _two_cluster_data(n=200, d=4)
    gmm = G.fit(jax.random.PRNGKey(2), data, n_components=3, n_iters=20)
    p = os.path.join(tmp_path, "gmm.npz")
    G.save_npz(p, gmm)
    back = G.load_npz(p)
    x = data[:10]
    np.testing.assert_allclose(np.asarray(G.log_prob(gmm, x)),
                               np.asarray(G.log_prob(back, x)), rtol=1e-6)
    # reference npz schema: weights/means/covariances keys
    raw = np.load(p)
    assert set(raw.files) == {"weights", "means", "covariances"}


def test_sample_statistics():
    d = 4
    mean = jnp.asarray(np.full((1, d), 2.0, np.float32))
    cov = jnp.asarray(np.eye(d, dtype=np.float32) * 0.25)[None]
    gmm = G.GmmParams(jnp.ones((1,), jnp.float32), mean, cov)
    s = G.sample(gmm, jax.random.PRNGKey(3), (4000,))
    assert np.allclose(np.asarray(s).mean(0), 2.0, atol=0.05)
    assert np.allclose(np.asarray(s).std(0), 0.5, atol=0.05)


def test_log_prob_grad_finite():
    data = _two_cluster_data(n=100, d=3)
    gmm = G.fit(jax.random.PRNGKey(4), data, n_components=2, n_iters=10)
    g = jax.grad(lambda x: G.log_prob(gmm, x).sum())(data[:5])
    assert np.all(np.isfinite(np.asarray(g)))


def test_pack_initial_state_layout():
    B = 2
    state = {
        "joints": jnp.zeros((B, 66)) + 1,
        "joints_vel": jnp.zeros((B, 66)) + 2,
        "trans_vel": jnp.zeros((B, 3)) + 3,
        "root_orient_vel": jnp.zeros((B, 3)) + 4,
    }
    packed = G.pack_initial_state(state)
    assert packed.shape == (B, 138)
    np.testing.assert_array_equal(np.asarray(packed[0, :66]), 1)
    np.testing.assert_array_equal(np.asarray(packed[0, 66:132]), 2)
    np.testing.assert_array_equal(np.asarray(packed[0, 132:135]), 3)
    np.testing.assert_array_equal(np.asarray(packed[0, 135:]), 4)
