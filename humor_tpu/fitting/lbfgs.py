"""On-device L-BFGS driver for test-time optimization.

The reference drives every TTO stage with torch.optim.LBFGS
(strong-Wolfe line search, lr=1.0, history 10; reference
/root/reference/humor/fitting/motion_optimizer.py:24,233-236) whose
closure re-evaluates the full energy each line-search probe on the host.

TPU-first design: one jitted `lax.scan` over L-BFGS iterations built on
optax's scale_by_lbfgs + zoom (strong-Wolfe) linesearch — the entire
stage (tens of iterations x line-search evals) is a single XLA program
with zero host round-trips. Variable freezing (the stage-3 sub-schedule,
motion_optimizer.py:479-511) is a gradient mask pytree instead of the
reference's re-created optimizers, so phase changes don't recompile.
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


def run_lbfgs(
    loss_fn: Callable[..., Any],
    init_params: Any,
    num_iters: int,
    *args,
    mask: Optional[Any] = None,
    history_size: int = 10,
    max_linesearch_steps: int = 20,
    has_aux: bool = False,
) -> LbfgsResult:
    """Minimize `loss_fn(params, *args)` with L-BFGS + strong-Wolfe zoom.

    mask: optional pytree of {0,1} matching `init_params`; frozen variables
    get zero gradient (and therefore zero update). Matches the reference's
    stage-wise variable selection without rebuilding the optimizer.

    Jit-safe: call inside jit, or jit the caller. `num_iters`,
    `history_size`, `max_linesearch_steps` are static.
    """
    if has_aux:
        def value_fn(p, *a):
            return loss_fn(p, *a)[0]
    else:
        value_fn = loss_fn

    opt = optax.lbfgs(
        memory_size=history_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one",
        ),
    )

    vg = jax.value_and_grad(value_fn)

    def step(carry, _):
        params, opt_state, best_params, best_val, value, grads = carry
        # best-iterate tracking: the returned params are always the best
        # point actually evaluated
        better = jnp.isfinite(value) & (value < best_val)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(better, p, b), best_params, params)
        best_val = jnp.where(better, value, best_val)

        updates, new_opt_state = opt.update(
            grads, opt_state, params,
            value=value, grad=grads,
            value_fn=lambda p: value_fn(p, *args),
        )
        updates = _masked(updates, mask)
        new_params = optax.apply_updates(params, updates)

        # monotone safeguard: a failed zoom line search can accept an
        # ascent step, after which the corrupted curvature memory sends
        # L-BFGS off to divergence. Evaluate the step (the value+grad at
        # the new point doubles as the NEXT iteration's evaluation, so
        # the safeguard costs nothing); if it is not a (near-)descent
        # step, reject it AND restart the optimizer memory from the
        # current point.
        new_value, new_grads = vg(new_params, *args)
        new_grads = _masked(new_grads, mask)
        tol = 1e-4 * jnp.abs(value) + 1e-8
        ok = jnp.isfinite(new_value) & (new_value <= value + tol) \
            & jnp.isfinite(optax.global_norm(updates))

        sel = lambda n, o: jnp.where(ok, n, o)
        new_params = jax.tree_util.tree_map(sel, new_params, params)
        fresh_state = opt.init(params)
        new_opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b) if hasattr(a, "dtype")
            else a, new_opt_state, fresh_state)
        new_value = jnp.where(ok, new_value, value)
        new_grads = jax.tree_util.tree_map(sel, new_grads, grads)
        return (new_params, new_opt_state, best_params, best_val,
                new_value, new_grads), value

    value0, grads0 = vg(init_params, *args)
    grads0 = _masked(grads0, mask)
    init_carry = (init_params, opt.init(init_params), init_params,
                  jnp.asarray(jnp.inf), value0, grads0)
    (params, _, best_params, best_val, _, _), losses = jax.lax.scan(
        step, init_carry, None, length=num_iters)

    # the scan's best-tracking lags one evaluation behind: fold in the
    # final iterate too
    final_val = value_fn(params, *args)
    better = jnp.isfinite(final_val) & (final_val < best_val)
    params = jax.tree_util.tree_map(
        lambda b, p: jnp.where(better, p, b), best_params, params)

    if has_aux:
        final_loss, aux = loss_fn(params, *args)
    else:
        final_loss, aux = loss_fn(params, *args), None
    return LbfgsResult(params=params, loss=final_loss,
                       loss_history=losses, stats_history=aux)


def make_mask(params: Any, trainable: Callable[[str], bool]) -> Any:
    """Build a {0.,1.} mask pytree from a per-top-level-key predicate.
    Works on dict-of-arrays variable bundles (the TTO variable layout)."""
    return {k: jnp.asarray(1.0 if trainable(k) else 0.0)
            for k in params}
