"""Pallas TPU stacked-panel Cholesky + triangular inverse (all-2-d design).

The factorization cost of this framework's GP tiles is dominated by the
SEQUENTIAL depth of the Cholesky panel steps, not FLOPs: XLA's stock
batched Cholesky on [B, N, N] advances one rank-1 step at a time with tiny
per-step work (~0.8 TFLOP/s measured on [128, 512, 512] f32). This kernel
restores utilization by factorizing the T=128 diagonal blocks of EVERY
tile simultaneously: the blocks are stacked along rows as one 2-d array
[(Bc*T), T] so each of the T sequential steps does full-width vector work
plus small indicator matmuls, and the same loop emits the block inverses
(forward substitution rows) for free. The O(N^3) trailing updates stay
outside as XLA batched matmuls (ops/linalg.cholesky_blocked_panels).

Everything inside the kernel is strictly 2-d: Mosaic's TPU layout
inference CHECK-fails on 3-d singleton shapes (layout.h:320), which killed
the earlier [Bc, N, N]-batched kernel (ops/pallas/cholesky.py, kept
opt-in). Per-block scalar/row broadcasts are expressed as matmuls with a
[(Bc*T), Bc] block-indicator matrix built from 2-d iota.

Replaces the reference's cuSOLVER/LAPACK potrf path
(tf.linalg.cholesky in GPSat/models/gpflow_models.py via gpflow;
scipy.linalg.cholesky in GPSat/models/pure_python_gpr.py:485-488).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128  # panel size = TPU lane width
_BC = 8  # blocks factorized per grid step: in/out double-buffers, the
# (A, Inv) loop carry, and ~10 live [Bc*T, T] mask/broadcast temporaries
# must fit the 16 MB VMEM scoped limit (Bc=16 OOMs at 16.36 MB)


def _panel_kernel(a_ref, l_ref, inv_ref, *, Bc: int):
    """Factorize Bc stacked [T, T] SPD blocks: L lower-Cholesky + L^-1.

    a_ref/l_ref/inv_ref: [(Bc*T), T] f32; block b lives in rows b*T:(b+1)*T.
    """
    S = Bc * T
    A0 = a_ref[...]

    ri = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)  # absolute row
    pos = ri % T  # row index within its block [S, 1]
    ci = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)  # column index
    # rowpos[i, t] = 1 where t == i%T  (per-block transpose helper)
    rowpos = (ci == pos).astype(jnp.float32)  # [S, T]
    # blocksel[i, b] = 1 where i//T == b  (per-block reduce/broadcast)
    bi = jax.lax.broadcasted_iota(jnp.int32, (S, Bc), 1)
    blocksel = ((ri // T) == bi).astype(jnp.float32)  # [S, Bc]
    cb = jax.lax.broadcasted_iota(jnp.int32, (Bc, T), 1)  # [Bc, T] col index

    dn_reduce = (((0,), (0,)), ((), ()))  # blocksel^T @ x : [S,*] -> [Bc,*]
    dn_bcast = (((1,), (0,)), ((), ()))  # blocksel @ y  : [Bc,*] -> [S,*]
    hi = jax.lax.Precision.HIGHEST

    def step(k, carry):
        A, Inv = carry
        cm = (ci == k).astype(jnp.float32)  # [S, T] column-k mask
        rk = (pos == k).astype(jnp.float32)  # [S, 1] row-k-of-block mask

        a_k = jnp.sum(A * cm, axis=1, keepdims=True)  # [S, 1] column k
        # per-block pivot d_b = sqrt(A[k, k])
        s = jax.lax.dot_general(blocksel, a_k * rk, dn_reduce, precision=hi)  # [Bc, 1]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        dinv = 1.0 / d
        dcast = jax.lax.dot_general(blocksel, d, dn_bcast, precision=hi)  # [S, 1]
        dinvcast = jax.lax.dot_general(blocksel, dinv, dn_bcast, precision=hi)

        # new column k of L: sqrt on the diagonal, scaled below, 0 above
        l_col = jnp.where(pos > k, a_k * dinvcast, jnp.where(pos == k, dcast, 0.0))  # [S, 1]

        # per-block row view of l_col: Mcast[i, t] = l_col[block(i)*T + t]
        M = jax.lax.dot_general(blocksel, l_col * rowpos, dn_reduce, precision=hi)  # [Bc, T]
        Mcast = jax.lax.dot_general(blocksel, M, dn_bcast, precision=hi)  # [S, T]

        # write column k, rank-1 trailing update on columns > k
        A = jnp.where(cm > 0, l_col, A - jnp.where(ci > k, l_col * Mcast, 0.0))

        # inverse row k (forward substitution):
        #   R_b = (e_k - L_b[k, :k] @ Inv_b[:k, :]) / d_b
        Lr = jax.lax.dot_general(blocksel, A * rk, dn_reduce, precision=hi)  # [Bc, T] row k
        Lr = jnp.where(cb < k, Lr, 0.0)
        Lrcast = jax.lax.dot_general(blocksel, Lr, dn_bcast, precision=hi)  # [S, T]
        w = jnp.sum(rowpos * Lrcast, axis=1, keepdims=True)  # [S, 1] w_i = L_b[k, i%T]
        c = jax.lax.dot_general(blocksel, w * Inv, dn_reduce, precision=hi)  # [Bc, T]
        R = ((cb == k).astype(jnp.float32) - c) * dinv  # [Bc, T]
        Rcast = jax.lax.dot_general(blocksel, R, dn_bcast, precision=hi)  # [S, T]
        Inv = jnp.where(rk > 0, Rcast, Inv)
        return A, Inv

    A, Inv = jax.lax.fori_loop(0, T, step, (A0, jnp.zeros_like(A0)))
    # A's strict upper triangle still holds stale trailing values: mask it
    l_ref[...] = jnp.where(ci <= pos, A, 0.0)
    inv_ref[...] = Inv


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_panels_stacked(Kd: jnp.ndarray, interpret: bool = False):
    """[(Nb*T), T] stacked SPD blocks -> (L_stacked, Linv_stacked).

    Nb need not be a multiple of the per-step block count; the driver pads.
    """
    S, t = Kd.shape
    assert t == T and S % T == 0, (S, t)
    nb = S // T
    Bc = min(_BC, nb)
    pad = (-nb) % Bc
    if pad:
        # pad with identity blocks so sqrt/div stay clean
        eye = jnp.tile(jnp.eye(T, dtype=Kd.dtype), (pad, 1))
        Kd = jnp.concatenate([Kd, eye], axis=0)
        S = Kd.shape[0]
    grid = (S // (Bc * T),)
    L, Inv = pl.pallas_call(
        functools.partial(_panel_kernel, Bc=Bc),
        grid=grid,
        in_specs=[pl.BlockSpec((Bc * T, T), lambda g: (g, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((Bc * T, T), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc * T, T), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T), Kd.dtype),
            jax.ShapeDtypeStruct((S, T), Kd.dtype),
        ],
        interpret=interpret,
    )(Kd)
    if pad:
        L = L[: nb * T]
        Inv = Inv[: nb * T]
    return L, Inv


def factor_panels(Kd: jnp.ndarray, interpret: bool | None = None):
    """Batched diagonal-block factorization: [B, T, T] -> (L, Linv) same shape."""
    import os

    if interpret is None:
        # interpret mode lets the CPU test suite exercise the kernel logic
        interpret = os.environ.get("GPSAT_PALLAS_INTERPRET", "0") == "1"
    B = Kd.shape[0]
    assert Kd.shape[1:] == (T, T), Kd.shape
    Ls, Is = factor_panels_stacked(Kd.reshape(B * T, T), interpret=interpret)
    return Ls.reshape(B, T, T), Is.reshape(B, T, T)
