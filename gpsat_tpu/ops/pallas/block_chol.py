"""Pallas TPU fused diagonal-block Cholesky + inverse (3-d masked design).

The third generation of the batched-Cholesky attack (see
ops/pallas/cholesky.py and ops/pallas/panel_chol.py for the two measured
losers and docs/architecture.md for the numbers). The production wall is
XLA's stock batched Cholesky: ~0.27 TFLOP/s on [512, 512, 512] f32 because
every rank-1 panel step streams the trailing matrix through HBM. The two
prior kernels fixed the memory residency but lost on sequential depth:

- cholesky.py keeps whole [Bc, N, N] tiles in VMEM -> Bc capped at 8,
  grid serialization multiplies the per-panel step count 64x.
- panel_chol.py factors only diagonal blocks but in a 2-d layout whose
  per-block broadcasts are indicator-matrix MXU matmuls -> heavy steps,
  Bc capped at 8 again.

This kernel combines the two fixes and adds a third:

1. Only the [T, T] diagonal blocks live in VMEM (T=64), so ~64 tiles
   factor per grid step and the whole [512, 64, 64] panel batch runs in
   8 grid steps x 64 loop steps.
2. Blocks are kept 3-d [Bc, T, T]; per-block reduce/broadcast are masked
   `where`+`sum` VPU ops (the cholesky.py idiom Mosaic compiles well),
   not indicator matmuls.
3. The SAME 64-step loop emits the block inverse: after column j of L is
   final, inverse row j follows by one [Bc, 1, T] x [Bc, T, T] forward-
   substitution contraction. Fusing halves the sequential depth vs
   factor-then-invert.

The O(N^3) trailing updates and the off-diagonal inverse assembly stay
outside as XLA batched MXU matmuls (ops/linalg.chol_winv_pair).

Replaces the reference's cuSOLVER/LAPACK potrf + trtri pair
(tf.linalg.cholesky/triangular_solve via gpflow in
GPSat/models/gpflow_models.py; scipy.linalg.cholesky in
GPSat/models/pure_python_gpr.py:485-488).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLOCK = 64


def _cholinv_kernel(a_ref, l_ref, w_ref, *, Bc: int, T: int):
    """Factor [Bc, T, T] SPD blocks: L (lower Cholesky) and W = L^-1.

    One fused T-step loop; all Bc blocks advance together. NaN semantics:
    a non-positive pivot produces NaN (rsqrt) which propagates into both
    outputs — downstream safe_cholesky ok-flags rely on this, so there is
    deliberately NO pivot clamping.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)

    def step(j, carry):
        M, W = carry
        # --- Cholesky column j (right-looking rank-1 form) ---
        # two chained single-axis reductions, NOT axis=(1, 2): the fused
        # form lowers through a rank-1 [Bc] intermediate whose reshape to
        # [Bc, 1, 1] hard-crashes Mosaic layout inference on libtpu
        # 2026-08 ("Check failed: arr.size() >= layout_rank(implicit_dim)")
        diag_jj = jnp.sum(jnp.where((rows == j) & (cols == j), M, 0.0), axis=2, keepdims=True)
        diag_jj = jnp.sum(diag_jj, axis=1, keepdims=True)
        d = jax.lax.rsqrt(diag_jj)  # [Bc, 1, 1] = 1 / L[j, j]
        col_j = jnp.sum(jnp.where(cols == j, M, 0.0), axis=2, keepdims=True)  # [Bc, T, 1]
        colj = jnp.where(rows[:, :, :1] >= j, col_j * d, 0.0)  # final column j of L
        M = jnp.where(cols == j, colj, M)
        col_row = jnp.swapaxes(colj, 1, 2)  # [Bc, 1, T]
        M = jnp.where((cols > j) & (rows >= cols), M - colj * col_row, M)
        # --- inverse row j (forward substitution; W rows >= j still zero) ---
        # row j of L is final now (columns <= j written, rest masked off)
        lj = jnp.sum(jnp.where(rows == j, M, 0.0), axis=1, keepdims=True)  # [Bc, 1, T]
        lj = jnp.where(cols[:, :1, :] < j, lj, 0.0)
        acc = jax.lax.dot_general(
            lj, W, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [Bc, 1, T] = L[j, :j] @ W[:j, :]
        ej = (cols[:, :1, :] == j).astype(M.dtype)
        wj = (ej - acc) * d  # [Bc, 1, T]
        W = jnp.where(rows == j, wj, W)
        return M, W

    M0 = a_ref[...]
    M, W = jax.lax.fori_loop(0, T, step, (M0, jnp.zeros_like(M0)))
    l_ref[...] = jnp.where(rows >= cols, M, 0.0)
    w_ref[...] = W


def _pick_bc(B: int, T: int) -> int:
    """Blocks per grid step. Live set per [Bc, T, T] array is Bc*T*T*4
    bytes; the loop carries 2 (M, W), pallas double-buffers in/out (3x2),
    and the step body holds a few temporaries — budget ~12 arrays inside
    a 12 MB share of VMEM. Non-multiple B is identity-padded by the
    caller (factor_blocks) — never shrink Bc toward 1 chasing
    divisibility, that serializes the grid up to 64x."""
    budget = 12 * 1024 * 1024
    return int(max(1, budget // (12 * T * T * 4)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_blocks(Kd: jnp.ndarray, interpret: bool = False):
    """[B, T, T] stacked SPD blocks -> (L, W = L^-1), both [B, T, T]."""
    B, T, t = Kd.shape
    assert t == T, Kd.shape
    Bc = min(_pick_bc(B, T), B)
    pad = (-B) % Bc
    if pad:
        eye = jnp.broadcast_to(jnp.eye(T, dtype=Kd.dtype), (pad, T, T))
        Kd = jnp.concatenate([Kd, eye], axis=0)
    L, W = pl.pallas_call(
        functools.partial(_cholinv_kernel, Bc=Bc, T=T),
        grid=(Kd.shape[0] // Bc,),
        in_specs=[pl.BlockSpec((Bc, T, T), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((Bc, T, T), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, T, T), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(Kd.shape, Kd.dtype),
            jax.ShapeDtypeStruct(Kd.shape, Kd.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(Kd.shape[0] * T**3),
            bytes_accessed=int(3 * Kd.shape[0] * T * T * 4),
            transcendentals=Kd.shape[0] * T,
        ),
    )(Kd)
    if pad:
        L, W = L[:B], W[:B]
    return L, W


def factor_blocks_auto(Kd: jnp.ndarray, interpret: bool | None = None):
    """factor_blocks with the CPU-test interpret-mode escape hatch."""
    import os

    if interpret is None:
        interpret = os.environ.get("GPSAT_PALLAS_INTERPRET", "0") == "1"
    return factor_blocks(Kd, interpret=interpret)
