"""Legacy import path (ref: GPSat/vff.py — the VFF spectral engine,
adapted there from github.com/st--/VFF).

The TPU-native implementation lives in models/vff.py and materializes
the spectral Kuu matrices DENSELY (at VFF's M ~ tens per dimension one
small Cholesky beats structured-matrix dispatch on TPU — see
docs/divergences.md). Consequently the reference's structured-matrix
algebra classes (DiagMat / Rank1Mat(+/-) / LowRankMat(+/-) /
BlockDiagMat, vff.py:14-377) have no analogue here BY DESIGN: every
Kuu/P consumer works on ordinary dense arrays.

Reference-name mapping (signatures documented in models/vff.py —
kernels are named by string rather than gpflow objects, and the M
frequencies are counted rather than passed as an index vector):

  make_Kuu(kernel, lengthscale, variance, a, b, M) -> dense [2M+1, 2M+1]
  make_Kuf(kernel, lengthscale, X1d, a, b, M)      -> [2M+1, N]
  kron / kron_two                                   -> dense Kronecker
  make_kvs / make_kvs_two                           -> ROW-wise Khatri-Rao
                                                       (the tf convention)
  make_kvs_np / make_kvs_two_np                     -> COLUMN-wise twins
                                                       (the np convention)
  GPR_kron                                          -> VFFModel (collapsed
                                                       ELBO + posterior)
"""

from functools import reduce

import jax.numpy as jnp

from gpsat_tpu.models.vff import (  # noqa: F401
    VFFModel,
    VFFModel as GPR_kron,
    elbo,
    kron,
    make_kuf as make_Kuf,
    make_kuf as make_Kuf_np,
    make_kuu_dense as make_Kuu,
    make_kvs as _make_kvs_cols,
    predict,
    product_prior_gram,
    vff_common,
)


def kron_two(A, B):
    """Kronecker product of two matrices (ref: vff.py:528-534)."""
    return kron([A, B])


def make_kvs_two(A, B):
    """ROW-wise Khatri-Rao ('Kronecker-vector stack'), the reference's tf
    convention (ref: vff.py:540-546): [N, Ma] x [N, Mb] -> [N, Ma*Mb]."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    return (A[:, :, None] * B[:, None, :]).reshape(A.shape[0], A.shape[1] * B.shape[1])


def make_kvs(k):
    """Row-wise Khatri-Rao of a list of matrices (ref: vff.py:548-550)."""
    return reduce(make_kvs_two, k)


def make_kvs_two_np(A, B):
    """COLUMN-wise Khatri-Rao, the reference's numpy twin (ref:
    vff.py:553-556): [Ma, N] x [Mb, N] -> [Ma*Mb, N]."""
    return _make_kvs_cols([A, B])


def make_kvs_np(A_list):
    """Column-wise Khatri-Rao of a list of matrices (ref: vff.py:558-559)."""
    return _make_kvs_cols(A_list)


__all__ = [
    "GPR_kron",
    "VFFModel",
    "elbo",
    "kron",
    "kron_two",
    "make_Kuf",
    "make_Kuf_np",
    "make_Kuu",
    "make_kvs",
    "make_kvs_np",
    "make_kvs_two",
    "make_kvs_two_np",
    "predict",
    "product_prior_gram",
    "vff_common",
]
