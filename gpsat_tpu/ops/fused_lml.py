"""Masked GPR LML with analytic gradients (custom_vjp) — the TPU hot path.

Autodiff through Cholesky/solves costs another full factorization's worth
of sequential triangular work in the backward pass (measured: 41-58 ms per
value+grad on [128, 512] f32 batches). The classic analytic form
(Rasmussen & Williams eq. 5.9, the same formulas the reference hand-codes
in GPSat/models/pure_python_gpr.py:439-506) needs only:

  forward:  K -> L (Cholesky), W = L^-1 (blocked inversion, MXU),
            Kinv = W^T W, alpha = Kinv y, lml
  backward: dlml/dtheta = 0.5 sum(G * dK/dtheta),  G = alpha alpha^T - Kinv
            with dK/dtheta in closed form per kernel — pure elementwise.

Everything is matmuls + elementwise; no triangular solves anywhere and the
backward is ~free. Hyperparameter bijectors chain outside via autodiff of
the scalar reparameterization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpsat_tpu.ops import linalg as LA

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979
_R_FLOOR = 1e-36  # same r^2 floor as ops.kernels so values agree exactly


def _kernel_and_r(kernel: str, X, lengthscales, kernel_variance):
    from gpsat_tpu.ops import kernels as KK

    r2 = KK.scaled_squared_dist(X, X, lengthscales)
    r = jnp.sqrt(jnp.maximum(r2, _R_FLOOR))
    if kernel in ("RBF", "SquaredExponential"):
        k = kernel_variance * jnp.exp(-0.5 * r2)
    elif kernel in ("Matern12", "Exponential"):
        k = kernel_variance * jnp.exp(-r)
    elif kernel == "Matern32":
        k = kernel_variance * (1.0 + _SQRT3 * r) * jnp.exp(-_SQRT3 * r)
    elif kernel == "Matern52":
        k = kernel_variance * (1.0 + _SQRT5 * r + 5.0 / 3.0 * r2) * jnp.exp(-_SQRT5 * r)
    else:
        raise NotImplementedError(f"fused LML supports Matern12/32/52 + RBF, got {kernel}")
    return k, r


def _dk_dl_factor(kernel: str, r, kernel_variance):
    """phi(r) such that dk/dl_d = phi(r) * Delta_d^2 / l_d^3 (elementwise)."""
    if kernel in ("RBF", "SquaredExponential"):
        return kernel_variance * jnp.exp(-0.5 * r * r)
    if kernel in ("Matern12", "Exponential"):
        return kernel_variance * jnp.exp(-r) / r
    if kernel == "Matern32":
        return 3.0 * kernel_variance * jnp.exp(-_SQRT3 * r)
    if kernel == "Matern52":
        return (5.0 / 3.0) * kernel_variance * (1.0 + _SQRT5 * r) * jnp.exp(-_SQRT5 * r)
    raise NotImplementedError(kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def masked_gpr_lml_fused(kernel, X, y, mask, lengthscales, kernel_variance, likelihood_variance, jitter):
    """Masked GPR log marginal likelihood with a hand-fused analytic VJP.

    GRADIENT CONTRACT: differentiable w.r.t. the hyperparameters
    (lengthscales, kernel_variance, likelihood_variance) AND the
    observations y (d lml / dy = -K^-1 y, free — alpha is already a
    residual; needed by trainable mean functions whose constant enters
    through y). The custom VJP returns symbolic-zero cotangents for X,
    mask, and jitter — callers that differentiate through coordinates
    (e.g. inducing-point optimization) would silently receive zeros; use
    the autodiff LML path (models/gpr.py neg_lml) for that.
    """
    lml, _ = _fused_fwd_impl(kernel, X, y, mask, lengthscales, kernel_variance, likelihood_variance, jitter)
    return lml


def _fused_fwd_impl(kernel, X, y, mask, lengthscales, kernel_variance, likelihood_variance, jitter):
    m = mask.astype(X.dtype)
    n = jnp.sum(m)
    k, r = _kernel_and_r(kernel, X, lengthscales, kernel_variance)
    K = LA.add_diag(k, likelihood_variance + jitter)
    Km = LA.mask_gram(K, m)
    ym = (y * m)[:, None]
    if LA.recursive_path_enabled(Km):
        # statically-unrolled recursive factor pair: L and the FULL
        # W = L^-1 in one pass of fused base-block chains + MXU matmuls
        # (no XLA While/dynamic-update-slice expansion at all)
        L, W = LA.chol_winv_recursive(Km)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        Kinv = jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST)
        alpha = jnp.matmul(Kinv, ym, precision=jax.lax.Precision.HIGHEST)
        quad = jnp.sum(ym * alpha)
        lml = -0.5 * quad - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
        residuals = (X, m, lengthscales, kernel_variance, r, Kinv, alpha[:, 0])
        return lml, residuals
    if LA.block_path_enabled(Km):
        # fused diag-block factor pair (Pallas kernel + XLA trailing): L and
        # the FULL W = L^-1 in one walk. With W in hand the value solve is a
        # matmul — note this makes value-only callers pay the full inverse
        # (production f32 runs single_eval = always value+grad, so there are
        # no value-only callers on this path)
        L, W = LA.chol_winv_pair(Km)
        v = jnp.matmul(W, ym, precision=jax.lax.Precision.HIGHEST)
        quad = jnp.sum(v * v)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        lml = -0.5 * quad - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
        Kinv = jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST)
        alpha = jnp.matmul(Kinv, ym, precision=jax.lax.Precision.HIGHEST)
        residuals = (X, m, lengthscales, kernel_variance, r, Kinv, alpha[:, 0])
        return lml, residuals
    if LA.panel_path_enabled(Km):
        # stacked-panel factor pair: the pallas kernel (under the expert
        # vmap, via custom_vmap) factors all tiles' diagonal blocks
        # simultaneously and emits their inverses; value solve and full
        # W = L^-1 become block matmuls
        L, Wdiag = LA.chol_panel_pair(Km)
        v = LA.tri_solve_from_diag(L, Wdiag, ym)
        quad = jnp.sum(v * v)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        lml = -0.5 * quad - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
        W = LA.tri_inv_from_diag(L, Wdiag)
        Kinv = jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST)
        alpha = jnp.matmul(Kinv, ym, precision=jax.lax.Precision.HIGHEST)
        residuals = (X, m, lengthscales, kernel_variance, r, Kinv, alpha[:, 0])
        return lml, residuals
    L = LA.cholesky(Km)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    if LA.use_fast_inverse(Km.dtype):
        # f32 production runs single_eval — every call consumes the
        # gradient residuals, so the inverse is always materialized and the
        # quadratic form can reuse alpha (quad = y^T K^-1 y = ym . alpha),
        # dropping the narrow N-step sequential triangular solve from every
        # iteration. (Value-only callers — non-default backtracking probes —
        # pay the full inverse here; the f64 branch below keeps their DCE.)
        W = LA.tri_inv_blocked(L)
        Kinv = jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST)
        alpha = jnp.matmul(Kinv, ym, precision=jax.lax.Precision.HIGHEST)
        quad = jnp.sum(ym * alpha)
    else:
        # value via one triangular solve — value-only callers (backtracking
        # linesearch probes, which skip the slope) never touch the residuals
        # below, so XLA dead-code-eliminates the O(N^3) inverse work for them
        v = LA.tri_solve(L, ym)
        quad = jnp.sum(v * v)
        W = LA.tri_inv_blocked(L)
        Kinv = jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST)
        alpha = jnp.matmul(Kinv, ym, precision=jax.lax.Precision.HIGHEST)
    lml = -0.5 * quad - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
    residuals = (X, m, lengthscales, kernel_variance, r, Kinv, alpha[:, 0])
    return lml, residuals


def _fused_fwd(kernel, X, y, mask, lengthscales, kernel_variance, likelihood_variance, jitter):
    return _fused_fwd_impl(kernel, X, y, mask, lengthscales, kernel_variance, likelihood_variance, jitter)


def _fused_bwd(kernel, residuals, g):
    X, m, lengthscales, kernel_variance, r, Kinv, alpha = residuals
    outer_m = m[:, None] * m[None, :]
    G = (alpha[:, None] * alpha[None, :] - Kinv) * outer_m

    # lengthscale gradients: dk/dl_d = phi(r) * Delta_d^2 / l_d^3
    phi = _dk_dl_factor(kernel, r, kernel_variance)
    D = X.shape[1]
    Gphi = G * phi
    d_ls = []
    for d in range(D):
        delta2 = (X[:, d, None] - X[None, :, d]) ** 2
        d_ls.append(0.5 * jnp.sum(Gphi * delta2) / lengthscales[d] ** 3)
    d_ls = jnp.stack(d_ls)

    # kernel variance: dK/dkv = k / kv (k has zero masked off-diagonals in
    # G anyway); recompute k cheaply from r
    k_unit, _ = _kernel_and_r(kernel, X, lengthscales, 1.0)
    d_kv = 0.5 * jnp.sum(G * k_unit)

    # likelihood variance: dK/dlv = I on valid rows
    d_lv = 0.5 * jnp.sum(m * (alpha**2 - jnp.diagonal(Kinv)))

    zX = jnp.zeros_like(X)
    # d lml / dy = -K^-1 y = -alpha on valid rows (alpha already masked
    # through the masked Gram); enables trainable mean functions
    dy = g * (-alpha) * m
    zm = jnp.zeros_like(m)
    return (zX, dy, zm, g * d_ls, g * d_kv, g * d_lv, jnp.zeros_like(d_lv))


masked_gpr_lml_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# profiled (concentrated) LML: kernel variance solved in closed form
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def masked_gpr_lml_profiled(kernel, X, y, mask, lengthscales, tau, jitter):
    """Masked GPR LML with the kernel variance profiled out.

    With K = sigma2 * A, A = k_unit(ls) + tau*I (tau = noise/signal ratio),
    the LML's argmax over sigma2 is closed-form: sigma2_hat = y^T A^-1 y / n.
    This returns lml(ls, sigma2_hat, tau*sigma2_hat) — the same optimum as
    the joint problem over one fewer search dimension, still one Cholesky
    per evaluation. Gradients (w.r.t. ls, tau, y) follow the envelope
    theorem: G_p = alpha alpha^T / sigma2_hat - A^-1 replaces the joint
    form's G (Rasmussen & Williams eq. 5.9 structure).

    Same gradient contract as masked_gpr_lml_fused: zero cotangents for
    X, mask, jitter.
    """
    lml, _ = _profiled_fwd_impl(kernel, X, y, mask, lengthscales, tau, jitter)
    return lml


def profiled_sigma2(kernel, X, y, mask, lengthscales, tau, jitter):
    """Closed-form sigma2_hat = y^T A^-1 y / n at (lengthscales, tau).

    All-masked (zero-observation) tiles — the engine's batch-padding
    lanes — return 1.0 instead of 0/0."""
    m = mask.astype(X.dtype)
    n = jnp.sum(m)
    one = jnp.asarray(1.0, dtype=X.dtype)
    k, _ = _kernel_and_r(kernel, X, lengthscales, one)
    A = LA.add_diag(k, tau + jitter)
    Am = LA.mask_gram(A, m)
    L = LA.cholesky(Am)
    v = LA.tri_solve(L, (y * m)[:, None])
    return jnp.where(n > 0, jnp.sum(v * v) / jnp.maximum(n, one), one)


def _profiled_fwd_impl(kernel, X, y, mask, lengthscales, tau, jitter):
    # Limitation: always uses the plain blocked Cholesky — the opt-in
    # stacked-panel (Pallas) branch of masked_gpr_lml_fused is NOT wired
    # here, so enabling GPSAT_PANEL_CHOL + GPSAT_PROFILE together silently
    # runs the non-panel factorization. The panel path is a documented
    # measured-loser kept opt-in (docs/architecture.md), so the profiled
    # path deliberately stays on the default route.
    m = mask.astype(X.dtype)
    n = jnp.sum(m)
    one = jnp.asarray(1.0, dtype=X.dtype)
    k, r = _kernel_and_r(kernel, X, lengthscales, one)
    A = LA.add_diag(k, tau + jitter)
    Am = LA.mask_gram(A, m)
    ym = (y * m)[:, None]
    L = LA.cholesky(Am)
    v = LA.tri_solve(L, ym)
    quad = jnp.sum(v * v)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    # all-masked (zero-observation) lanes — the engine's batch padding —
    # must give a finite value (0, like the joint path) and zero grads,
    # not 0/0: sig2 is forced to 1 there (log sig2 = 0, and the backward's
    # alpha/sig2 terms are already zero through the mask)
    empty = n == 0
    sig2 = jnp.where(empty, one, quad / jnp.maximum(n, one))
    # joint lml at (ls, sig2, tau*sig2): -(n/2)(1 + log sig2) - logdet/2 - (n/2)log 2pi
    lml = jnp.where(
        empty,
        jnp.zeros_like(quad),
        -0.5 * n * (1.0 + jnp.log(sig2)) - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi),
    )
    W = LA.tri_inv_blocked(L)
    Ainv = jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST)
    alpha = jnp.matmul(Ainv, ym, precision=jax.lax.Precision.HIGHEST)
    residuals = (X, m, lengthscales, r, Ainv, alpha[:, 0], sig2)
    return lml, residuals


def _profiled_fwd(kernel, X, y, mask, lengthscales, tau, jitter):
    return _profiled_fwd_impl(kernel, X, y, mask, lengthscales, tau, jitter)


def _profiled_bwd(kernel, residuals, g):
    X, m, lengthscales, r, Ainv, alpha, sig2 = residuals
    outer_m = m[:, None] * m[None, :]
    G = (alpha[:, None] * alpha[None, :] / sig2 - Ainv) * outer_m

    one = jnp.asarray(1.0, dtype=X.dtype)
    phi = _dk_dl_factor(kernel, r, one)
    D = X.shape[1]
    Gphi = G * phi
    d_ls = []
    for d in range(D):
        delta2 = (X[:, d, None] - X[None, :, d]) ** 2
        d_ls.append(0.5 * jnp.sum(Gphi * delta2) / lengthscales[d] ** 3)
    d_ls = jnp.stack(d_ls)

    # dA/dtau = I on valid rows
    d_tau = 0.5 * jnp.sum(m * (alpha**2 / sig2 - jnp.diagonal(Ainv)))

    # d lml / dy = -(A^-1 y) / sig2 on valid rows (envelope through sig2_hat)
    dy = g * (-alpha / sig2) * m
    zX = jnp.zeros_like(X)
    zm = jnp.zeros_like(m)
    return (zX, dy, zm, g * d_ls, g * d_tau, jnp.zeros_like(d_tau))


masked_gpr_lml_profiled.defvjp(_profiled_fwd, _profiled_bwd)
