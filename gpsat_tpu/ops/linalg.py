"""Masked dense linear algebra for padded expert tiles.

The reference fits each local expert on a ragged, dynamically-selected data
subset (ref: GPSat/local_experts.py:930-1260 serial loop; LAPACK Cholesky in
GPSat/models/pure_python_gpr.py:485-488). Ragged shapes are hostile to XLA,
so the TPU design pads every tile to a bucket size Nmax and carries a
row-validity mask. Padded rows/columns are neutralized *inside* the Gram
matrix (identity row/col trick) so that:

  - cholesky(K_masked) has unit diagonal on padded rows  -> logdet unaffected
  - solves give zero on padded rows (y is zeroed there)  -> quadratic form,
    predictions and gradients are exactly those of the unpadded problem.

All functions are single-tile [N, ...]; batch with vmap and shard with
shard_map over the expert axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray

DEFAULT_JITTER = 1e-6


def mask_gram(K: Array, mask: Array, diag_value: float = 1.0) -> Array:
    """Zero padded rows/cols of K and put ``diag_value`` on padded diagonal.

    K: [N, N], mask: [N] (1.0 valid / 0.0 padded).
    """
    m = mask.astype(K.dtype)
    outer = m[:, None] * m[None, :]
    Km = K * outer
    diag_fix = (1.0 - m) * diag_value
    return Km + jnp.diag(diag_fix)


def add_diag(K: Array, value: Array) -> Array:
    return K + value * jnp.eye(K.shape[0], dtype=K.dtype)


def cholesky(K: Array) -> Array:
    """Cholesky dispatch: Pallas blocked kernel on TPU for 128-multiple
    tile sizes (gpsat_tpu.ops.pallas.cholesky — XLA's stock op runs at
    <1 TFLOP/s on these shapes), jnp fallback elsewhere."""
    from gpsat_tpu.ops.pallas.cholesky import cholesky as _pchol

    return _pchol(K)


def safe_cholesky(K: Array, jitter: float = 0.0):
    """Cholesky with optional jitter; returns (L, ok_flag).

    ok is False if the factorization produced NaNs (the batched analogue of
    the reference's LinAlgError -> inf-objective fallback,
    ref: GPSat/models/pure_python_gpr.py:499-501).
    """
    if jitter:
        K = add_diag(K, jnp.asarray(jitter, dtype=K.dtype))
    L = cholesky(K)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(L)))
    return L, ok


def tri_solve(L: Array, B: Array, *, lower: bool = True, trans: bool = False) -> Array:
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


def cho_solve(L: Array, B: Array) -> Array:
    """Solve K x = B given K = L L^T."""
    return tri_solve(L, tri_solve(L, B), trans=True)


def logdet_from_chol(L: Array) -> Array:
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


@partial(jax.jit, static_argnames=("kernel",))
def masked_gpr_lml(
    X: Array,
    y: Array,
    mask: Array,
    lengthscales: Array,
    kernel_variance: Array,
    likelihood_variance: Array,
    *,
    kernel: str = "Matern32",
    jitter: float = 0.0,
) -> Array:
    """Log marginal likelihood of exact GPR on one padded tile.

    lml = -1/2 y^T K^-1 y - 1/2 log|K| - n/2 log(2 pi),  K = Kf + sigma_n^2 I
    (Rasmussen & Williams Algo 2.1; reference formula at
    GPSat/models/pure_python_gpr.py:439-506). n = sum(mask).
    """
    from gpsat_tpu.ops import kernels as _k

    m = mask.astype(X.dtype)
    n = jnp.sum(m)
    Kf = _k.gram(kernel, X, X, lengthscales, kernel_variance)
    K = add_diag(Kf, likelihood_variance + jitter)
    Km = mask_gram(K, m)
    L = cholesky(Km)
    ym = (y * m)[:, None]
    alpha = cho_solve(L, ym)
    quad = jnp.sum(ym * alpha)
    logdet = logdet_from_chol(L)
    return -0.5 * quad - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
