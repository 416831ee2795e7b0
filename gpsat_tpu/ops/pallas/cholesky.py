"""Pallas TPU batched blocked Cholesky.

XLA's stock Cholesky on TPU runs the panel factorization serially through
HBM and reaches ~0.25 TFLOP/s on the batch shapes this framework lives on
(B~128 experts x N~512 tiles). This kernel keeps each expert's matrix
resident in VMEM for the whole factorization (N=512 f32 = 1 MB) and does
the O(N^3) trailing updates as MXU matmuls:

  for each TxT diagonal block:
    1. unblocked TxT factorization            (VPU, T sequential steps)
    2. invert the TxT triangular factor       (VPU, T sequential steps)
    3. panel = A[k+T:, k:k+T] @ inv(Lkk)^T    (MXU)
    4. trailing -= panel @ panel^T            (MXU)

Batched via the pallas grid (one program per expert tile). Differentiable
via custom_vjp with the standard Cholesky pullback (Murray 2016),
evaluated with XLA triangular solves.

Use ``cholesky(K)``: [.., N, N] -> lower factor, auto-fallback to
jnp.linalg.cholesky off-TPU or for unsupported shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
_MAX_VMEM_N = 1024  # 4 MB matrix + workspace comfortably inside VMEM


def _unblocked_chol_block(A, T):
    """Factorize [Bc, T, T] SPD blocks in-register (lower), T rank-1 steps.

    Mosaic TC lowering has no dynamic_slice, so traced-index accesses are
    masked full-block reductions; the Bc tiles advance TOGETHER through the
    sequential steps — that amortization is what makes the kernel pay
    (sequential depth is the latency wall, not FLOPs).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)

    def step(j, M):
        # all intermediates kept >=3-d, and reductions go one axis at a
        # time: axis=(1, 2) keepdims lowers through a rank-1 [Bc]
        # intermediate whose reshape CHECK-fails Mosaic layout inference
        diag_jj = jnp.sum(jnp.where((rows == j) & (cols == j), M, 0.0), axis=2, keepdims=True)
        diag_jj = jnp.sum(diag_jj, axis=1, keepdims=True)
        d = jax.lax.rsqrt(diag_jj)  # [Bc,1,1]
        col_j = jnp.sum(jnp.where(cols == j, M, 0.0), axis=2, keepdims=True)  # [Bc,T,1]
        # column j: diag -> sqrt (= M[j,j]*d), below-diag scaled by d
        colj = jnp.where(rows[:, :, :1] >= j, col_j * d, 0.0)  # [Bc,T,1]
        M = jnp.where(cols == j, colj, M)
        # trailing rank-1 update on columns > j, rows >= col
        col_row = jnp.swapaxes(colj, 1, 2)  # [Bc,1,T]
        M = jnp.where((cols > j) & (rows >= cols), M - colj * col_row, M)
        return M

    A = jax.lax.fori_loop(0, T, step, A)
    return jnp.where(rows >= cols, A, 0.0)


def _tri_inv_block(L, T):
    """Invert [Bc, T, T] lower-triangular blocks by forward substitution
    (masked full-block form; Bc tiles advance together)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)

    def step(i, W):
        # row i of W: (e_i - L[i, :i] @ W[:i, :]) / L[i, i]; >=3-d throughout
        li = jnp.sum(jnp.where(rows == i, L, 0.0), axis=1, keepdims=True)  # [Bc,1,T]
        li = jnp.where(cols[:, :1, :] < i, li, 0.0)
        acc = jax.lax.dot_general(
            li, W, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [Bc,1,T]
        lii = jnp.sum(jnp.where((rows == i) & (cols == i), L, 0.0), axis=2, keepdims=True)
        lii = jnp.sum(lii, axis=1, keepdims=True)
        ei = (cols[:, :1, :] == i).astype(L.dtype)  # [1,1,T]
        wi = (ei - acc) / lii  # [Bc,1,T]
        return jnp.where(rows == i, wi, W)

    return jax.lax.fori_loop(0, T, step, jnp.zeros_like(L))


def _chol_kernel(a_ref, out_ref, *, Bc: int, N: int, T: int):
    # work in-place on the output VMEM block ([Bc, N, N]); the kb loop is a
    # python loop so every ref slice below is static (no dynamic_slice on TC)
    out_ref[...] = a_ref[...]
    nblk = N // T
    bdims = (((2,), (2,)), ((0,), (0,)))  # batched contract dim2-with-dim2

    for kb in range(nblk):
        k = kb * T
        Lkk = _unblocked_chol_block(out_ref[:, k : k + T, k : k + T], T)
        out_ref[:, k : k + T, k : k + T] = Lkk
        if kb + 1 < nblk:
            Winv = _tri_inv_block(Lkk, T)
            panel = out_ref[:, k + T :, k : k + T]  # [Bc, R, T], R static
            # batched panel @ Winv^T without a transpose op
            Lpanel = jax.lax.dot_general(panel, Winv, bdims, preferred_element_type=jnp.float32)
            out_ref[:, k + T :, k : k + T] = Lpanel
            out_ref[:, k + T :, k + T :] = out_ref[:, k + T :, k + T :] - jax.lax.dot_general(
                Lpanel, Lpanel, bdims, preferred_element_type=jnp.float32
            )

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, N, N), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, N, N), 2)
    out_ref[...] = jnp.where(rows >= cols, out_ref[...], 0.0)


def _pick_bc(B: int, N: int) -> int:
    """Tiles per program: amortize the sequential panel steps across as
    many tiles as fit in VMEM. The pallas pipeline double-buffers the
    aliased in/out block across grid steps, so budget ~2 copies of
    Bc*N^2*4 bytes within ~10 MB."""
    budget = 10 * 1024 * 1024
    bc = max(1, budget // (2 * N * N * 4))
    while bc > 1 and B % bc != 0:
        bc -= 1
    return int(bc)


def _pallas_chol_batched(K: jnp.ndarray, T: int = BLOCK) -> jnp.ndarray:
    B, N, _ = K.shape
    Bc = _pick_bc(B, N)
    kernel = functools.partial(_chol_kernel, Bc=Bc, N=N, T=min(T, N))
    return pl.pallas_call(
        kernel,
        grid=(B // Bc,),
        in_specs=[pl.BlockSpec((Bc, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Bc, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, N), K.dtype),
        # factor in place: one aliased buffer instead of separate in+out
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=int(B * N**3 / 3 * 2), bytes_accessed=int(2 * B * N * N * 4), transcendentals=B * N
        ),
    )(K)


def _supported(K: jnp.ndarray) -> bool:
    # opt-in: the current kernel measures ~2x slower than XLA's Cholesky on
    # v5e (the 128-step masked panel loops dominate); enable explicitly with
    # GPSAT_PALLAS_CHOL=1 while iterating on it
    import os

    if os.environ.get("GPSAT_PALLAS_CHOL", "0") != "1":
        return False
    if K.ndim not in (2, 3):
        return False
    N = K.shape[-1]
    if N % BLOCK != 0:
        return False
    if N > _MAX_VMEM_N:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@jax.custom_vjp
def cholesky(K: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky. TPU + N a multiple of 128 (<=1024) ->
    Pallas kernel; anything else -> jnp.linalg.cholesky. Accepts [N, N]
    (vmappable — pallas batching prepends the vmap dim to the grid) or
    [B, N, N]."""
    if _supported(K):
        if K.ndim == 2:
            return _pallas_chol_batched(K[None])[0]
        return _pallas_chol_batched(K)
    return jnp.linalg.cholesky(K)


def _chol_fwd(K):
    L = cholesky(K)
    return L, L


def _chol_bwd(L, dL):
    # standard pullback: dK = 0.5 * L^-T (Phi(L^T dL) + Phi(L^T dL)^T ... )
    # using Phi = tril with halved diagonal (Murray 2016, eq. 12)
    def phi(M):
        return jnp.tril(M) - 0.5 * jnp.diagonal(M, axis1=-2, axis2=-1)[..., None] * jnp.eye(
            M.shape[-1], dtype=M.dtype
        )

    M = jnp.matmul(jnp.swapaxes(L, -1, -2), dL, precision=jax.lax.Precision.HIGHEST)
    P = phi(M)
    # solve L^T X = P  -> X = L^-T P ; then dK = X L^-1 => solve (L) from right
    X = jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), P, lower=False)
    dK = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), jnp.swapaxes(X, -1, -2), lower=False
    )
    dK = jnp.swapaxes(dK, -1, -2)
    dK = 0.5 * (dK + jnp.swapaxes(dK, -1, -2))
    return (dK,)


cholesky.defvjp(_chol_fwd, _chol_bwd)
