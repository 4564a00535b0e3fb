"""On-device L-BFGS driver for test-time optimization.

The reference drives every TTO stage with torch.optim.LBFGS
(strong-Wolfe line search, lr=1.0, history 10; reference
/root/reference/humor/fitting/motion_optimizer.py:24,233-236) whose
closure re-evaluates the full energy each line-search probe on the host.

TPU-first design: one jitted `lax.scan` over L-BFGS iterations built on
optax's scale_by_lbfgs — the entire stage (tens of iterations x
line-search evals) is a single XLA program with zero host round-trips.
Variable freezing (the stage-3 sub-schedule, motion_optimizer.py:479-511)
is a gradient mask pytree instead of the reference's re-created
optimizers, so phase changes don't recompile.

Two line searches:

  * "zoom" — optax's sequential strong-Wolfe zoom (the reference's
    semantics). Each probe is a full closure evaluation; the accepted
    point's value+grad are fetched from the optimizer state so the
    monotone safeguard costs nothing extra.
  * "parallel" (default) — a speculative vectorized line search. The TTO
    closures are latency-bound at small window batches (the stage-3
    closure is a 59-step sequential rollout of 1024-wide MLPs at B=2, far
    below the MXU tile), so K candidate step sizes cost barely more than
    one when evaluated as ONE vmapped closure call. Each iteration
    evaluates a log-spaced candidate grid recentered on the previously
    accepted step, takes the largest candidate satisfying strong Wolfe
    (falling back to the best finite descent point), and reuses the
    selected candidate's value+grad as the next iteration's evaluation —
    exactly one batched closure eval per L-BFGS iteration, versus 2-8+
    sequential evals for zoom. Strong-Wolfe-accepted steps preserve the
    positive-curvature guarantee; non-Wolfe descent accepts are covered
    by the monotone safeguard below.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class LbfgsResult(NamedTuple):
    params: Any            # optimized variable pytree
    loss: jnp.ndarray      # final loss value
    loss_history: jnp.ndarray  # (num_iters,) loss per iteration
    stats_history: Any     # pytree of per-iteration aux stats (or None)


def _masked(grads: Any, mask: Optional[Any]) -> Any:
    if mask is None:
        return grads
    return jax.tree_util.tree_map(
        lambda g, m: g * jnp.asarray(m, g.dtype), grads, mask)


def _vdot(a: Any, b: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


# strong-Wolfe constants (Nocedal & Wright defaults; also torch's)
_C1, _C2 = 1e-4, 0.9


def _candidate_multipliers(num_candidates: int) -> jnp.ndarray:
    """Log-spaced relative multipliers spanning ~3 decades around the
    previously accepted step size."""
    return jnp.geomspace(8.0, 0.008, num_candidates)


def run_lbfgs(
    loss_fn: Callable[..., Any],
    init_params: Any,
    num_iters: int,
    *args,
    mask: Optional[Any] = None,
    history_size: int = 10,
    max_linesearch_steps: int = 20,
    has_aux: bool = False,
    linesearch: str = "parallel",
    num_candidates: int = 8,
    tol_grad: Optional[float] = None,
    tol_change: Optional[float] = None,
    stall_patience: int = 3,
) -> LbfgsResult:
    """Minimize `loss_fn(params, *args)` with L-BFGS + strong-Wolfe line
    search ("parallel" speculative-vectorized by default, "zoom" for
    optax's sequential zoom).

    mask: optional pytree of {0,1} matching `init_params`; frozen variables
    get zero gradient (and therefore zero update). Matches the reference's
    stage-wise variable selection without rebuilding the optimizer.

    `max_linesearch_steps` bounds the ZOOM search's sequential probes;
    the parallel search's budget is `num_candidates` (its grid size) —
    each knob applies only to its own search.

    tol_grad / tol_change: convergence early exit (the reference's torch
    LBFGS semantics — tolerance_grad/tolerance_change,
    torch/optim/lbfgs.py defaults 1e-7/1e-9). When either is set, the
    iteration loop becomes a `lax.while_loop` that stops once the masked
    gradient inf-norm is <= tol_grad, or once `stall_patience`
    CONSECUTIVE iterations each move the params by <= tol_change
    (inf-norm). The patience window absorbs single monotone-safeguard
    restarts (a rejected step moves nothing but the NEXT steepest-descent
    step may recover); a persistent stall is a converged/stuck fixed
    point — the knee sweep measured entire doublings of the iteration
    budget changing nothing (RESULTS.md). Both None (default) keeps the
    fixed-length `lax.scan`, bit-identical to previous behavior. The
    unreached tail of `loss_history` is filled with the final value.

    Jit-safe: call inside jit, or jit the caller. `num_iters`,
    `history_size`, `max_linesearch_steps`, `linesearch`,
    `num_candidates`, the tolerances, and `stall_patience` are static.
    """
    if has_aux:
        def value_fn(p, *a):
            return loss_fn(p, *a)[0]
    else:
        value_fn = loss_fn

    vg = jax.value_and_grad(value_fn)

    if linesearch == "zoom":
        step = _make_zoom_step(value_fn, vg, args, mask, history_size,
                               max_linesearch_steps)
        opt_init = step.opt_init
        extra0 = ()
    elif linesearch == "parallel":
        step = _make_parallel_step(value_fn, vg, args, mask, history_size,
                                   num_candidates)
        opt_init = step.opt_init
        extra0 = (jnp.asarray(1.0),)  # previously accepted step size
    elif linesearch == "armijo":
        step = _make_armijo_step(value_fn, vg, args, mask, history_size,
                                 num_candidates)
        opt_init = step.opt_init
        extra0 = (jnp.asarray(1.0),)
    else:
        raise ValueError(f"unknown linesearch {linesearch!r}")

    value0, grads0 = vg(init_params, *args)
    grads0 = _masked(grads0, mask)
    init_carry = (init_params, opt_init(init_params), init_params,
                  jnp.asarray(jnp.inf), value0, grads0) + extra0
    if tol_grad is None and tol_change is None:
        carry, losses = jax.lax.scan(step, init_carry, None,
                                     length=num_iters)
    else:
        carry, losses = _while_until_converged(
            step, init_carry, num_iters,
            0.0 if tol_grad is None else tol_grad,
            0.0 if tol_change is None else tol_change,
            stall_patience)
    params, _, best_params, best_val, final_value, _ = carry[:6]

    # the scan's best-tracking lags one evaluation behind: fold in the
    # final iterate too (its value is already in the carry — no extra eval)
    better = jnp.isfinite(final_value) & (final_value < best_val)
    params = jax.tree_util.tree_map(
        lambda p, b: jnp.where(better, p, b), params, best_params)

    if has_aux:
        final_loss, aux = loss_fn(params, *args)
    else:
        final_loss, aux = loss_fn(params, *args), None
    return LbfgsResult(params=params, loss=final_loss,
                       loss_history=losses, stats_history=aux)


def _tree_inf_norm(tree: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: jnp.max(jnp.abs(x)), tree))
    return jax.tree_util.tree_reduce(jnp.maximum, leaves,
                                     jnp.asarray(0.0))


def _while_until_converged(step, init_carry, num_iters, tol_grad,
                           tol_change, stall_patience):
    """Run the scan-step body under `lax.while_loop` with the torch-LBFGS
    convergence exits (see run_lbfgs docstring). Identical math per
    iteration; only the trip count is dynamic."""
    losses0 = jnp.full((num_iters,), jnp.nan,
                       dtype=jnp.asarray(init_carry[4]).dtype)

    def cond(state):
        i, _, _, stall = state
        return (i < num_iters) & (stall < stall_patience)

    def body(state):
        i, carry, losses, stall = state
        params_old = carry[0]
        new_carry, val = step(carry, None)
        losses = losses.at[i].set(val)
        change = _tree_inf_norm(jax.tree_util.tree_map(
            lambda a, b: a - b, new_carry[0], params_old))
        gnorm = _tree_inf_norm(new_carry[5])  # already masked
        stall = jnp.where(change <= tol_change, stall + 1, 0)
        stall = jnp.where(gnorm <= tol_grad,
                          jnp.asarray(stall_patience, stall.dtype), stall)
        return i + 1, new_carry, losses, stall

    n_done, carry, losses, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), init_carry, losses0,
                     jnp.asarray(0, jnp.int32)))
    # fill only the UNREACHED tail (i >= trip count) with the final value
    # so downstream loss logs stay finite; genuinely NaN iteration losses
    # from a diverged step must survive into the history (advisor finding)
    losses = jnp.where(jnp.arange(num_iters) >= n_done, carry[4], losses)
    return carry, losses


class _Step:
    """Scan-step callable carrying its optimizer's init fn."""

    def __init__(self, fn, opt_init):
        self._fn = fn
        self.opt_init = opt_init

    def __call__(self, carry, x):
        return self._fn(carry, x)


def _accept_or_restart(ok, new_params, params, new_value, value,
                       new_grads, grads, new_opt_state, fresh_state):
    """Monotone safeguard: a failed line search can accept an ascent
    step, after which the corrupted curvature memory sends L-BFGS off to
    divergence. If the step is not (near-)descent, reject it AND restart
    the optimizer memory from the current point."""
    sel = lambda n, o: jnp.where(ok, n, o)
    new_params = jax.tree_util.tree_map(sel, new_params, params)
    new_opt_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b) if hasattr(a, "dtype") else a,
        new_opt_state, fresh_state)
    new_value = jnp.where(ok, new_value, value)
    new_grads = jax.tree_util.tree_map(sel, new_grads, grads)
    return new_params, new_opt_state, new_value, new_grads


def _track_best(params, value, best_params, best_val):
    """Best-iterate tracking: the returned params are always the best
    point actually evaluated."""
    better = jnp.isfinite(value) & (value < best_val)
    best_params = jax.tree_util.tree_map(
        lambda b, p: jnp.where(better, p, b), best_params, params)
    return best_params, jnp.where(better, value, best_val)


def _make_zoom_step(value_fn, vg, args, mask, history_size,
                    max_linesearch_steps):
    opt = optax.lbfgs(
        memory_size=history_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one",
        ),
    )
    # the zoom linesearch already evaluated value+grad at the point it
    # accepted; fetch them from the optimizer state instead of paying a
    # second full closure evaluation per iteration. (Masked coordinates
    # never acquire a nonzero direction — grads, s and y are all masked —
    # so the accepted point IS `new_params` and the fetch is exact.)
    vg_state = optax.value_and_grad_from_state(lambda p: value_fn(p, *args))

    def step(carry, _):
        params, opt_state, best_params, best_val, value, grads = carry
        best_params, best_val = _track_best(params, value, best_params,
                                            best_val)

        updates, new_opt_state = opt.update(
            grads, opt_state, params,
            value=value, grad=grads,
            value_fn=lambda p: value_fn(p, *args),
        )
        updates = _masked(updates, mask)
        new_params = optax.apply_updates(params, updates)

        new_value, new_grads = vg_state(new_params, state=new_opt_state)
        new_grads = _masked(new_grads, mask)
        tol = 1e-4 * jnp.abs(value) + 1e-8
        ok = jnp.isfinite(new_value) & (new_value <= value + tol) \
            & jnp.isfinite(optax.global_norm(updates))

        new_params, new_opt_state, new_value, new_grads = \
            _accept_or_restart(ok, new_params, params, new_value, value,
                               new_grads, grads, new_opt_state,
                               opt.init(params))
        return (new_params, new_opt_state, best_params, best_val,
                new_value, new_grads), value

    return _Step(step, opt.init)


def _make_parallel_step(value_fn, vg, args, mask, history_size,
                        num_candidates):
    # direction = -H·g from the two-loop recursion; step size chosen by
    # the speculative batched search below
    opt = optax.chain(
        optax.scale_by_lbfgs(memory_size=history_size),
        optax.scale(-1.0),
    )
    mults = _candidate_multipliers(max(num_candidates - 1, 2))

    def step(carry, _):
        (params, opt_state, best_params, best_val, value, grads,
         alpha_prev) = carry
        best_params, best_val = _track_best(params, value, best_params,
                                            best_val)

        direction, new_opt_state = opt.update(
            grads, opt_state, params, value=value, grad=grads)
        direction = _masked(direction, mask)
        g0d = _vdot(grads, direction)  # < 0 for a descent direction

        # candidate step sizes: a grid recentered on the last accepted
        # step, plus the unit step (the natural L-BFGS step near
        # convergence), largest first so argmax(wolfe) picks the largest
        # acceptable candidate
        alphas = jnp.concatenate(
            [jnp.clip(alpha_prev * mults, 1e-8, 1e4), jnp.ones((1,))])
        alphas = jnp.sort(alphas)[::-1]

        def eval_at(a):
            p = jax.tree_util.tree_map(
                lambda pp, dd: pp + a.astype(pp.dtype) * dd,
                params, direction)
            v, g = vg(p, *args)
            return v, g

        vals, grads_k = jax.vmap(eval_at)(alphas)
        gkd = jax.vmap(lambda g: _vdot(g, direction))(grads_k)

        finite = jnp.isfinite(vals)
        armijo = vals <= value + _C1 * alphas * g0d
        curvature = jnp.abs(gkd) <= _C2 * jnp.abs(g0d)
        wolfe = finite & armijo & curvature
        idx_wolfe = jnp.argmax(wolfe)  # first (= largest alpha) match
        idx_desc = jnp.argmin(jnp.where(finite, vals, jnp.inf))
        idx = jnp.where(jnp.any(wolfe), idx_wolfe, idx_desc)

        a_sel = alphas[idx]
        new_params = jax.tree_util.tree_map(
            lambda pp, dd: pp + a_sel.astype(pp.dtype) * dd,
            params, direction)
        new_value = vals[idx]
        new_grads = _masked(
            jax.tree_util.tree_map(lambda g: g[idx], grads_k), mask)

        tol = 1e-4 * jnp.abs(value) + 1e-8
        ok = jnp.isfinite(new_value) & (new_value <= value + tol) \
            & jnp.isfinite(optax.global_norm(direction))

        new_params, new_opt_state, new_value, new_grads = \
            _accept_or_restart(ok, new_params, params, new_value, value,
                               new_grads, grads, new_opt_state,
                               opt.init(params))
        # a non-Wolfe accept (best finite descent point, no curvature
        # condition) can produce an s/y pair with y·s <= 0; optax's
        # scale_by_lbfgs only guards vdot == 0, so such a pair would make
        # the inverse-Hessian estimate indefinite. Keep the STEP but drop
        # its pair: restart the curvature memory from the accepted point
        # unless the step passed strong Wolfe. (When ok is False,
        # new_params == params, so this coincides with the safeguard's
        # restart.)
        keep_memory = ok & jnp.any(wolfe)
        fresh_at_new = opt.init(new_params)
        new_opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep_memory, a, b)
            if hasattr(a, "dtype") else a,
            new_opt_state, fresh_at_new)
        alpha_next = jnp.where(ok, a_sel, jnp.asarray(1.0))
        return (new_params, new_opt_state, best_params, best_val,
                new_value, new_grads, alpha_next), value

    return _Step(step, opt.init)


def _make_armijo_step(value_fn, vg, args, mask, history_size,
                      num_candidates):
    """Value-only speculative search (perf candidate #2, RESULTS.md):
    the candidate grid is evaluated WITHOUT gradients (about half the
    per-candidate cost of the full parallel search — no reverse pass over
    the rollout), the largest Armijo-satisfying candidate is taken, and
    ONE value_and_grad runs at the accepted point to feed the next
    iteration. The accepted point's gradient then applies the curvature
    condition retroactively: non-Wolfe steps keep the move but reset the
    L-BFGS memory (same policy as the parallel search)."""
    opt = optax.chain(
        optax.scale_by_lbfgs(memory_size=history_size),
        optax.scale(-1.0),
    )
    mults = _candidate_multipliers(max(num_candidates - 1, 2))

    def step(carry, _):
        (params, opt_state, best_params, best_val, value, grads,
         alpha_prev) = carry
        best_params, best_val = _track_best(params, value, best_params,
                                            best_val)

        direction, new_opt_state = opt.update(
            grads, opt_state, params, value=value, grad=grads)
        direction = _masked(direction, mask)
        g0d = _vdot(grads, direction)

        alphas = jnp.concatenate(
            [jnp.clip(alpha_prev * mults, 1e-8, 1e4), jnp.ones((1,))])
        alphas = jnp.sort(alphas)[::-1]

        def value_at(a):
            p = jax.tree_util.tree_map(
                lambda pp, dd: pp + a.astype(pp.dtype) * dd,
                params, direction)
            return value_fn(p, *args)

        vals = jax.vmap(value_at)(alphas)
        finite = jnp.isfinite(vals)
        armijo = finite & (vals <= value + _C1 * alphas * g0d)
        idx_armijo = jnp.argmax(armijo)   # largest passing alpha
        idx_desc = jnp.argmin(jnp.where(finite, vals, jnp.inf))
        idx = jnp.where(jnp.any(armijo), idx_armijo, idx_desc)

        a_sel = alphas[idx]
        new_params = jax.tree_util.tree_map(
            lambda pp, dd: pp + a_sel.astype(pp.dtype) * dd,
            params, direction)
        # one full evaluation at the accepted point (the next iteration's
        # value+grad — would be needed anyway)
        new_value, new_grads = vg(new_params, *args)
        new_grads = _masked(new_grads, mask)
        gkd = _vdot(new_grads, direction)
        curvature = jnp.abs(gkd) <= _C2 * jnp.abs(g0d)

        tol = 1e-4 * jnp.abs(value) + 1e-8
        ok = jnp.isfinite(new_value) & (new_value <= value + tol) \
            & jnp.isfinite(optax.global_norm(direction))

        new_params, new_opt_state, new_value, new_grads = \
            _accept_or_restart(ok, new_params, params, new_value, value,
                               new_grads, grads, new_opt_state,
                               opt.init(params))
        keep_memory = ok & jnp.any(armijo) & curvature
        fresh_at_new = opt.init(new_params)
        new_opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep_memory, a, b)
            if hasattr(a, "dtype") else a,
            new_opt_state, fresh_at_new)
        alpha_next = jnp.where(ok, a_sel, jnp.asarray(1.0))
        return (new_params, new_opt_state, best_params, best_val,
                new_value, new_grads, alpha_next), value

    return _Step(step, opt.init)


def make_mask(params: Any, trainable: Callable[[str], bool]) -> Any:
    """Build a {0.,1.} mask pytree from a per-top-level-key predicate.
    Works on dict-of-arrays variable bundles (the TTO variable layout)."""
    return {k: jnp.asarray(1.0 if trainable(k) else 0.0)
            for k in params}
