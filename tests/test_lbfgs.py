"""On-device L-BFGS: convergence on convex/ill-conditioned problems,
gradient-mask freezing (the stage-3 sub-schedule mechanism), jit-ability.
"""

import jax
import jax.numpy as jnp
import numpy as np

from humor_tpu.fitting.lbfgs import LbfgsResult, make_mask, run_lbfgs


def test_quadratic_converges():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]), jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)

    def loss(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    res = run_lbfgs(loss, {"x": jnp.zeros(3)}, num_iters=30)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.params["x"]), expected,
                               atol=1e-4)
    assert res.loss_history[-1] < res.loss_history[0]


def test_rosenbrock_under_jit():
    def loss(p):
        x, y = p["xy"][0], p["xy"][1]
        return (1 - x) ** 2 + 100.0 * (y - x * x) ** 2

    fit = jax.jit(lambda p0: run_lbfgs(loss, p0, num_iters=80).params)
    out = fit({"xy": jnp.asarray([-1.2, 1.0])})
    np.testing.assert_allclose(np.asarray(out["xy"]), [1.0, 1.0], atol=1e-3)


def test_mask_freezes_variables():
    def loss(p):
        return jnp.sum((p["a"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    init = {"a": jnp.zeros(2), "b": jnp.zeros(2)}
    mask = make_mask(init, lambda k: k == "a")
    res = run_lbfgs(loss, init, num_iters=25, mask=mask)
    np.testing.assert_allclose(np.asarray(res.params["a"]), 3.0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.params["b"]), 0.0)


def test_parallel_matches_zoom_quality():
    """The speculative vectorized line search must reach the same optima
    the sequential strong-Wolfe zoom does (same budget) on both a benign
    quadratic and the ill-conditioned Rosenbrock valley."""
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]), jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)

    def quad(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    def rosen(p):
        x, y = p["xy"][0], p["xy"][1]
        return (1 - x) ** 2 + 100.0 * (y - x * x) ** 2

    for loss, init, iters in (
            (quad, {"x": jnp.zeros(3)}, 30),
            (rosen, {"xy": jnp.asarray([-1.2, 1.0])}, 80)):
        rz = run_lbfgs(loss, init, num_iters=iters, linesearch="zoom")
        rp = run_lbfgs(loss, init, num_iters=iters, linesearch="parallel")
        assert float(rp.loss) <= float(rz.loss) + 1e-5, (
            f"parallel {float(rp.loss)} worse than zoom {float(rz.loss)}")


def test_has_aux_stats():
    def loss(p):
        l = jnp.sum(p["x"] ** 2)
        return l, {"l2": l}

    res = run_lbfgs(loss, {"x": jnp.ones(4)}, num_iters=10, has_aux=True)
    assert isinstance(res, LbfgsResult)
    assert np.asarray(res.stats_history["l2"]) < 1e-6


def test_armijo_matches_zoom_quality():
    """The value-only Armijo speculative search (one grad eval per
    iteration instead of K) must also reach the zoom optima at equal
    iteration budget."""
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]), jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)

    def quad(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    def rosen(p):
        x, y = p["xy"][0], p["xy"][1]
        return (1 - x) ** 2 + 100.0 * (y - x * x) ** 2

    for loss, init, iters in (
            (quad, {"x": jnp.zeros(3)}, 30),
            (rosen, {"xy": jnp.asarray([-1.2, 1.0])}, 80)):
        rz = run_lbfgs(loss, init, num_iters=iters, linesearch="zoom")
        ra = run_lbfgs(loss, init, num_iters=iters, linesearch="armijo")
        assert float(ra.loss) <= float(rz.loss) + 1e-5, (
            f"armijo {float(ra.loss)} worse than zoom {float(rz.loss)}")


def test_tolerance_early_exit_matches_scan():
    """tol_grad/tol_change switch the iteration loop to lax.while_loop
    (run_lbfgs docstring — the reference's torch-LBFGS tolerance exits).
    On a benign quadratic the early-exit run must reach the same optimum
    as the fixed-length scan, and the unreached loss_history tail must be
    filled with the final value (finite, monotone-consistent logs)."""
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]), jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)

    def loss(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    init = {"x": jnp.zeros(3)}
    ref = run_lbfgs(loss, init, num_iters=200)
    res = jax.jit(lambda p: run_lbfgs(loss, p, num_iters=200,
                                      tol_grad=1e-7,
                                      tol_change=1e-9))(init)
    np.testing.assert_allclose(np.asarray(res.params["x"]),
                               np.asarray(ref.params["x"]), atol=1e-5)
    hist = np.asarray(res.loss_history)
    assert np.all(np.isfinite(hist))
    # converged long before 200 iterations: the filled tail is constant
    assert hist[-1] == hist[-50]


def test_tolerance_early_exit_with_mask():
    """Frozen variables must not keep the loop alive (their zero grads
    and zero updates are excluded by the mask before the norms)."""
    def loss(p):
        return jnp.sum((p["a"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    init = {"a": jnp.zeros(2), "b": jnp.zeros(2)}
    mask = make_mask(init, lambda k: k == "a")
    res = run_lbfgs(loss, init, num_iters=100, mask=mask,
                    tol_grad=1e-7, tol_change=1e-9)
    np.testing.assert_allclose(np.asarray(res.params["a"]), 3.0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.params["b"]), 0.0)
