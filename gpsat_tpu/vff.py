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
  kron / kron_two, make_kvs / make_kvs_two          -> dense Kronecker ops
  GPR_kron                                          -> VFFModel (collapsed
                                                       ELBO + posterior)
"""

from gpsat_tpu.models.vff import (  # noqa: F401
    VFFModel,
    VFFModel as GPR_kron,
    elbo,
    kron,
    make_kuf as make_Kuf,
    make_kuf as make_Kuf_np,
    make_kuu_dense as make_Kuu,
    make_kvs,
    predict,
    product_prior_gram,
    vff_common,
)


def kron_two(A, B):
    """Kronecker product of two matrices (ref: vff.py:528-534)."""
    return kron([A, B])


def make_kvs_two(A, B):
    """Row-wise Khatri-Rao product of two matrices (ref: vff.py:540-546)."""
    return make_kvs([A, B])


# the reference exposes numpy twins of the tf ops (vff.py:553-561); the
# JAX implementations accept numpy arrays directly
make_kvs_two_np = make_kvs_two
make_kvs_np = make_kvs

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
