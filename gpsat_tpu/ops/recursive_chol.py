"""Fully-unrolled recursive Cholesky factor pair (L, W = L^-1) in plain XLA.

Why this exists: XLA expands `cholesky` and `triangular_solve` into While
loops over dynamic-update-slices. Under a large expert batch ([B, N, N]
with B~512, N~512) every one of the N unblocked steps re-materializes
whole blocks through HBM, and the loops cannot fuse across steps — the
measured cost anatomy put the factorization at 85.5 ms of a 143 ms fused
value-and-grad step (60%, ~0.8% of the f32 matmul ceiling) even though
its FLOPs are ~1 ms worth. Two Pallas kernels attacked the same wall and
lost to grid serialization (ops/pallas/{cholesky,panel_chol}.py, kept
opt-in; docs/architecture.md "measured losers").

This module removes the While loops instead: a STATICALLY UNROLLED
recursive-halving factorization,

    A = [[A11, .], [A21, A22]]
    L11, W11 = facpair(A11)          (recurse)
    L21      = A21 @ W11^T           (MXU)
    S        = A22 - L21 @ L21^T     (MXU)
    L22, W22 = facpair(S)            (recurse)
    W21      = -W22 @ (L21 @ W11)    (MXU)

down to a BASE-sized block factorized by a masked rank-1 lax.scan whose
carry is only the [.., base, base] block — per-step HBM traffic is
O(B*base^2) bytes instead of the expander's full-matrix round trips, and
the scan body is one small graph (a fully unrolled base compiles ~0.2 s
per column step, prohibitive at N=512). The inverse rides the same
recursion, so the factor pair that the fused analytic-gradient LML needs
(ops/fused_lml.py: W for the value solve, K^-1 for the gradient) comes
out of ONE pass with no triangular solves anywhere.

Sequential depth is the fundamental N-column sqrt chain plus a log-depth
matmul tree; everything else is batched MXU work at HIGHEST precision.

Replaces the reference's LAPACK/cuSOLVER potrf + trsm path
(scipy.linalg.cholesky in GPSat/models/pure_python_gpr.py:485-488,
tf.linalg.cholesky/triangular_solve via gpflow in
GPSat/models/gpflow_models.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# Base block edge. 32 balances unrolled-op count (n^2/2 fused elementwise
# steps per block) against matmul-tree depth; power of two keeps every
# recursion split MXU-aligned until the base.
_BASE = 32


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _mt(a):
    return jnp.swapaxes(a, -1, -2)


def _chol_tiny(A):
    """Statically-unrolled right-looking Cholesky, n <= _MICRO.

    The shrinking trailing block keeps every step a register-sized fused
    op; at n = 8 this is the innermost pivot factorization."""
    n = A.shape[-1]
    batch = A.shape[:-2]
    cols = []
    for j in range(n):
        d = jnp.sqrt(A[..., 0, 0])
        col = A[..., :, 0] / d[..., None]
        if j < n - 1:
            t = col[..., 1:]
            A = A[..., 1:, 1:] - t[..., :, None] * t[..., None, :]
        if j:
            col = jnp.concatenate([jnp.zeros(batch + (j,), dtype=col.dtype), col], axis=-1)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


_MICRO = 8  # rank of one scan step (pivot block factorized in-register)


def _chol_base(A, micro: int = _MICRO):
    """Masked right-looking Cholesky of [..., n, n], n <= base, as a
    lax.scan over RANK-`micro` column blocks.

    The carry is just the base block, so each step reads and writes
    O(batch * n^2) bytes — versus the whole-matrix traffic of XLA's
    expanded While loop. Rank-micro steps cut the sequential scan length
    to n/micro (TPU While-loop dispatch overhead, not math, dominates a
    rank-1 scan: measured 43.6 ms for the N=512 pair at rank 1). Column
    blocks come out as scan outputs (no dynamic-update-slice)."""
    n = A.shape[-1]
    while micro > 2 and (n <= micro or n % micro):
        micro //= 2  # ragged leaf: halve the rank until it divides n
    if n <= micro or n % micro:
        return _chol_tiny(A)  # truly ragged (odd/tiny) leaf: static path
    rows = jnp.arange(n)
    micro_ar = jnp.arange(micro)

    def step(M, s):
        j = s * micro
        cols = jax.lax.dynamic_slice_in_dim(M, j, micro, axis=-1)  # [.., n, r]
        P = jax.lax.dynamic_slice_in_dim(cols, j, micro, axis=-2)  # [.., r, r]
        Lp = _chol_tiny(P)
        Wp = _tri_inv_rec(Lp)
        below = jnp.where((rows >= j + micro)[:, None], cols, jnp.zeros_like(cols))
        Lb = jnp.matmul(below, jnp.swapaxes(Wp, -1, -2), precision=_HI)  # [.., n, r]
        # scatter the pivot factor into rows j..j+r of the column block
        onehot = ((rows[:, None] - j) == micro_ar[None, :]).astype(M.dtype)  # [n, r]
        Lcols = Lb + jnp.matmul(onehot, Lp, precision=_HI)
        # trailing update touches only rows/cols >= j+r (Lb is zero above)
        M = M - jnp.matmul(Lb, jnp.swapaxes(Lb, -1, -2), precision=_HI)
        return M, Lcols

    _, blocks = jax.lax.scan(step, A, jnp.arange(n // micro))
    # blocks: [n/r, ..., n, r]; column blocks concatenate along the last axis
    L = jnp.moveaxis(blocks, 0, -2)  # [..., n, n/r, r]
    return L.reshape(L.shape[:-3] + (n, n))


def _tri_inv_rec(L):
    """Inverse of a lower-triangular [..., n, n] by recursive halving:
    inv([[A, 0], [C, D]]) = [[A^-1, 0], [-D^-1 C A^-1, D^-1]]."""
    n = L.shape[-1]
    if n == 1:
        return 1.0 / L
    if n == 2:
        # closed form keeps the tree shallow at the bottom
        a = L[..., 0:1, 0:1]
        c = L[..., 1:2, 0:1]
        d = L[..., 1:2, 1:2]
        ia = 1.0 / a
        idd = 1.0 / d
        top = jnp.concatenate([ia, jnp.zeros_like(c)], axis=-1)
        bot = jnp.concatenate([-(idd * c * ia), idd], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    h = n // 2
    Wa = _tri_inv_rec(L[..., :h, :h])
    Wd = _tri_inv_rec(L[..., h:, h:])
    Wc = -_mm(Wd, _mm(L[..., h:, :h], Wa))
    top = jnp.concatenate([Wa, jnp.zeros_like(_mt(Wc))], axis=-1)
    bot = jnp.concatenate([Wc, Wd], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _facpair(A, base: int, micro: int):
    n = A.shape[-1]
    if n <= base:
        L = _chol_base(A, micro)
        return L, _tri_inv_rec(L)
    h = n // 2
    L11, W11 = _facpair(A[..., :h, :h], base, micro)
    L21 = _mm(A[..., h:, :h], _mt(W11))
    S = A[..., h:, h:] - _mm(L21, _mt(L21))
    L22, W22 = _facpair(S, base, micro)
    W21 = -_mm(W22, _mm(L21, W11))
    zero = jnp.zeros(A.shape[:-2] + (h, n - h), dtype=A.dtype)
    L = jnp.concatenate(
        [jnp.concatenate([L11, zero], axis=-1), jnp.concatenate([L21, L22], axis=-1)],
        axis=-2,
    )
    W = jnp.concatenate(
        [jnp.concatenate([W11, zero], axis=-1), jnp.concatenate([W21, W22], axis=-1)],
        axis=-2,
    )
    return L, W


@functools.partial(jax.jit, static_argnames=("base", "micro"))
def chol_winv_recursive(A, base: int = _BASE, micro: int = _MICRO):
    """[..., n, n] SPD -> (L, W = L^-1), statically unrolled.

    Any n >= 1 (recursion splits at n//2; ragged sizes land in the base
    case). Differentiable through ordinary autodiff (pure jnp ops), though
    the intended consumer is the custom-VJP fused LML, which never
    differentiates through it.
    """
    return _facpair(A, int(base), int(micro))
