"""Stationary covariance (Gram) construction — MXU-friendly.

Replaces the reference's third-party Gram builders (gpflow.kernels.* used at
GPSat/models/gpflow_models.py:116-135; explicit numpy math in
GPSat/models/pure_python_gpr.py:378-405) with pure-jnp constructions whose
dominant cost is a single matmul (the -2*X1@X2^T term of the squared
distance), so XLA tiles it onto the MXU and fuses the surrounding
elementwise work. Autodiff supplies the hyperparameter gradients that the
reference implements by hand (pure_python_gpr.py grads).

Conventions (match gpflow so hyperparameter optima coincide):
  r^2 = sum_d ((x1_d - x2_d) / lengthscale_d)^2     (ARD)
  Matern12: s2 * exp(-r)
  Matern32: s2 * (1 + sqrt(3) r) exp(-sqrt(3) r)
  Matern52: s2 * (1 + sqrt(5) r + 5 r^2/3) exp(-sqrt(5) r)
  RBF:      s2 * exp(-r^2 / 2)
  RationalQuadratic: s2 * (1 + r^2 / (2 alpha))^(-alpha)
  Cosine:   s2 * cos(2 pi sum_d (x1_d - x2_d)/l_d)
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

# smallest r^2 fed to sqrt — keeps d(sqrt)/dr2 finite at coincident points
_R2_FLOOR = 1e-36

KERNEL_NAMES = (
    "Matern12",
    "Exponential",
    "Matern32",
    "Matern52",
    "RBF",
    "SquaredExponential",
    "RationalQuadratic",
    "Cosine",
    "White",
)


def scaled_squared_dist(X1: Array, X2: Array, lengthscales: Array) -> Array:
    """[N,D],[M,D] -> [N,M] squared euclidean distance of X/l.

    Uses |a-b|^2 = |a|^2 + |b|^2 - 2 a.b so the N*M*D work is one matmul.
    """
    import jax

    ls = jnp.asarray(lengthscales)
    Xs1 = X1 / ls
    Xs2 = X2 / ls
    sq1 = jnp.sum(Xs1 * Xs1, axis=-1)[:, None]
    sq2 = jnp.sum(Xs2 * Xs2, axis=-1)[None, :]
    # full f32 accumulation: TPU matmuls default to bf16 passes, which is
    # catastrophic for near-singular Matern Grams (Cholesky fails /
    # optimizer can't meet tolerance)
    cross = jnp.matmul(Xs1, Xs2.T, precision=jax.lax.Precision.HIGHEST)
    r2 = sq1 + sq2 - 2.0 * cross
    return jnp.maximum(r2, 0.0)


def _r_from_r2(r2: Array) -> Array:
    return jnp.sqrt(jnp.maximum(r2, _R2_FLOOR))


def gram(kernel: str, X1: Array, X2: Array, lengthscales: Array, variance: Array, **kwargs) -> Array:
    """Cross-covariance matrix k(X1, X2) -> [N, M]."""
    if kernel in ("White",):
        # white noise: only nonzero on exactly-coincident points; for cross
        # grams this is 0 — callers use variance on the diagonal directly
        return jnp.zeros((X1.shape[0], X2.shape[0]), dtype=X1.dtype)

    if kernel == "Cosine":
        d = jnp.sum((X1[:, None, :] - X2[None, :, :]) / jnp.asarray(lengthscales), axis=-1)
        return variance * jnp.cos(2.0 * jnp.pi * d)

    r2 = scaled_squared_dist(X1, X2, lengthscales)
    if kernel in ("RBF", "SquaredExponential"):
        return variance * jnp.exp(-0.5 * r2)
    if kernel in ("Matern12", "Exponential"):
        r = _r_from_r2(r2)
        return variance * jnp.exp(-r)
    if kernel == "Matern32":
        r = _r_from_r2(r2)
        sqrt3_r = jnp.sqrt(3.0) * r
        return variance * (1.0 + sqrt3_r) * jnp.exp(-sqrt3_r)
    if kernel == "Matern52":
        r = _r_from_r2(r2)
        sqrt5_r = jnp.sqrt(5.0) * r
        return variance * (1.0 + sqrt5_r + 5.0 / 3.0 * r2) * jnp.exp(-sqrt5_r)
    if kernel == "RationalQuadratic":
        alpha = kwargs.get("alpha", 1.0)
        return variance * jnp.power(1.0 + r2 / (2.0 * alpha), -alpha)
    raise ValueError(f"unknown kernel: {kernel}; valid: {KERNEL_NAMES}")


def gram_diag(kernel: str, X: Array, variance: Array, **kwargs) -> Array:
    """Diagonal of k(X, X) -> [N] (stationary => variance everywhere)."""
    return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * variance
