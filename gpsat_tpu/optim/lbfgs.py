"""Batched L-BFGS with per-problem convergence flags.

Replaces the reference's host-side scipy L-BFGS-B round trips
(gpflow.optimizers.Scipy at GPSat/models/gpflow_models.py:317-321, and
scipy.optimize.minimize at GPSat/models/pure_python_gpr.py:269-342) with a
fully-jitted lax.while_loop driver around optax's L-BFGS (zoom linesearch),
so hundreds of independent expert objectives optimize inside ONE XLA program
(vmap over the expert axis) instead of one scipy session per expert.

Convergence mirrors scipy L-BFGS-B's criteria but with tighter defaults
(scipy: pgtol=1e-5, factr*eps=2.22e-9; here tol_grad=1e-6, tol_f=1e-11 so
optima agree with the reference's scipy-optimized values to <1e-6 in
hyperparameters — see tests/test_gpr_oracle.py):
  - pgtol: max|grad| <= tol_grad
  - factr: (f_prev - f) <= tol_f * max(|f|, |f_prev|, 1)

Bounds are not needed: constraint handling is a bijector reparameterization
(gpsat_tpu.ops.transforms), matching the reference's Sigmoid-bijector design
rather than box bounds.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu


class LBFGSResult(NamedTuple):
    params: dict
    converged: jnp.ndarray  # bool
    failed: jnp.ndarray  # bool — non-finite objective encountered
    num_iter: jnp.ndarray  # int
    final_value: jnp.ndarray
    final_grad_norm: jnp.ndarray


def minimize_lbfgs(
    fun: Callable,
    x0,
    *,
    max_iter: int = 500,
    tol_grad: float = 1e-6,
    tol_f: float = 1e-11,
    memory_size: int = 10,
    max_linesearch_steps: int = 32,
    linesearch: str = "zoom",
) -> LBFGSResult:
    """Minimize ``fun(pytree) -> scalar``; jit/vmap-compatible.

    Each vmapped instance runs its own while_loop trip count; under vmap the
    combined loop runs until every instance converges, with converged lanes
    frozen (their state no longer changes because we gate the update).

    linesearch: "zoom" (strong-Wolfe, scipy-parity default) or
    "backtracking" (Armijo, cheaper per iteration — every linesearch probe
    under vmap is paid by ALL lanes in lockstep, so fewer probes can beat
    better steps on large expert batches).
    """
    if linesearch == "zoom":
        ls = optax.scale_by_zoom_linesearch(max_linesearch_steps=max_linesearch_steps)
    elif linesearch == "backtracking":
        # store_grad=False: probes are value-only (the fused LML's gradient
        # work is dead-code-eliminated for them); the accepted point's
        # gradient is recomputed once by value_and_grad_from_state
        ls = optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_linesearch_steps, store_grad=False
        )
    else:
        raise ValueError(f"linesearch: {linesearch} not in ('zoom', 'backtracking')")
    opt = optax.lbfgs(memory_size=memory_size, linesearch=ls)

    if linesearch == "backtracking":
        # no grad cached in the linesearch state: evaluate directly (one
        # value+grad per iteration; probes inside the search are value-only)
        _vg = jax.value_and_grad(fun)
        value_and_grad = lambda x, state=None: _vg(x)  # noqa: E731
    else:
        value_and_grad = optax.value_and_grad_from_state(fun)

    def cond(carry):
        _, state, prev_val, done, failed, it = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(jnp.logical_or(done, failed)))

    def body(carry):
        x, state, prev_val, done, failed, it = carry
        value, grad = value_and_grad(x, state=state)
        updates, new_state = opt.update(grad, state, x, value=value, grad=grad, value_fn=fun)
        new_x = optax.apply_updates(x, updates)

        if linesearch == "zoom":
            # zoom caches value/grad at the accepted point in its state
            new_val = otu.tree_get(new_state, "value")
            new_grad = otu.tree_get(new_state, "grad")
        else:
            # backtracking (store_grad=False): converge on the pre-update
            # iterate's value/grad (one-iteration lag)
            new_val = value
            new_grad = grad
        gnorm = otu.tree_norm(new_grad, ord=jnp.inf)
        # scale by the current value only: prev_val can be +inf on the first
        # backtracking iteration and must not blow up the threshold
        f_small = (prev_val - new_val) <= tol_f * jnp.maximum(jnp.abs(new_val), 1.0)
        new_done = jnp.logical_or(gnorm <= tol_grad, f_small)
        new_failed = jnp.logical_not(jnp.isfinite(new_val))
        # on failure keep the previous iterate
        keep = jnp.logical_not(new_failed)
        x_out = jax.tree_util.tree_map(lambda a, b: jnp.where(keep, b, a), x, new_x)
        return (x_out, new_state, new_val, new_done, new_failed, it + 1)

    state0 = opt.init(x0)
    v0 = fun(x0)
    init_failed = jnp.logical_not(jnp.isfinite(v0))
    # backtracking converges on pre-update values: the first body iteration
    # re-evaluates f(x0), so seed prev_val with +inf there to avoid a
    # trivial zero-decrease stop
    prev0 = v0 if linesearch == "zoom" else jnp.asarray(jnp.inf, dtype=v0.dtype)
    carry = (x0, state0, prev0, jnp.asarray(False), init_failed, jnp.asarray(0))
    x, state, val, done, failed, it = jax.lax.while_loop(cond, body, carry)

    if linesearch == "zoom":
        grad = otu.tree_get(state, "grad")
    else:
        _, grad = jax.value_and_grad(fun)(x)
    gnorm = otu.tree_norm(grad, ord=jnp.inf)
    return LBFGSResult(
        params=x,
        converged=jnp.logical_and(done, jnp.logical_not(failed)),
        failed=failed,
        num_iter=it,
        final_value=val,
        final_grad_norm=gnorm,
    )
