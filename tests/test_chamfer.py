"""Chamfer / NN distance: correctness vs brute force, gradient parity
with autodiff-through-the-matrix, Pallas kernel parity (interpret mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humor_tpu.ops import chamfer as C


def _clouds(b=2, n=100, m=57, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(b, n, 3), jnp.float32),
            jnp.asarray(rng.randn(b, m, 3), jnp.float32))


def _brute(x, y):
    d = np.linalg.norm(np.asarray(x)[:, :, None] - np.asarray(y)[:, None],
                       axis=-1) ** 2
    return d.min(-1), d.argmin(-1)


def test_nn_distance_matches_brute_force():
    x, y = _clouds()
    dist, idx = C.nn_distance(x, y)
    bd, bi = _brute(x, y)
    np.testing.assert_allclose(np.asarray(dist), bd, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), bi)


def test_chamfer_bidirectional():
    x, y = _clouds()
    d1, d2 = C.chamfer_distance(x, y)
    assert d1.shape == x.shape[:2] and d2.shape == y.shape[:2]
    bd1, _ = _brute(x, y)
    bd2, _ = _brute(y, x)
    np.testing.assert_allclose(np.asarray(d1), bd1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), bd2, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    x, y = _clouds(b=1, n=20, m=15, seed=1)

    def loss_custom(x, y):
        d, _ = C.nn_distance(x, y)
        return jnp.sum(d * jnp.arange(1.0, d.shape[1] + 1.0))

    def loss_direct(x, y):
        d = jnp.sum((x[:, :, None] - y[:, None]) ** 2, axis=-1)
        dmin = jnp.min(d, axis=-1)
        return jnp.sum(dmin * jnp.arange(1.0, dmin.shape[1] + 1.0))

    gx1, gy1 = jax.grad(loss_custom, argnums=(0, 1))(x, y)
    gx2, gy2 = jax.grad(loss_direct, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2),
                               rtol=1e-4, atol=1e-5)


def test_pallas_kernel_parity_interpret():
    # non-tile-aligned sizes exercise the padding path
    x, y = _clouds(b=2, n=300, m=1100, seed=2)
    d_ref, i_ref = C._nn_jnp(x, y)
    d_pal, i_pal = C._nn_pallas(x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_identical_clouds_zero():
    x, _ = _clouds(b=1, n=30, m=10)
    d, idx = C.nn_distance(x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(30))
