"""Analytic FLOP accounting for the hot kernels (roofline honesty).

Counting convention: 1 fused multiply-add = 2 FLOPs; standard dense
linear-algebra counts (Cholesky N^3/3, triangular inverse N^3/3, dense
matmul [n,k]x[k,m] = 2nkm). These are MODEL flops — the work the math
requires — so achieved TFLOP/s = model_flops / seconds is directly
comparable across implementations (XLA may execute more, e.g. full dense
matmuls where triangular structure exists; that shows up as higher
achieved utilization than these numbers imply, never lower).

XLA's own cost analysis can't be used here: while_loop bodies are counted
once regardless of trip count, and the L-BFGS iteration count is the
dominant factor.
"""

from __future__ import annotations


def gpr_fused_iter_flops(N: int, D: int) -> float:
    """One L-BFGS iteration of the fused value+grad masked LML on an
    N-point tile (ops/fused_lml.py single_eval path — every iteration
    executes the full forward + analytic backward):

      gram distance matmul   2 N^2 D
      Cholesky               N^3 / 3
      blocked tri inverse    N^3 / 3
      Kinv = W^T W           2 N^3      (dense matmul; triangular-aware
                                         would be N^3 — counted as executed)
      value solve + alpha    ~4 N^2
      backward contractions  (4 + 2D) N^2   (G*phi, per-dim delta^2 sums)
    """
    return (2.0 / 3.0 + 2.0) * N**3 + (2.0 * D + 2 * D + 8.0) * N**2


def gpr_predict_flops(N: int, P: int, D: int) -> float:
    """Posterior mean+var at P points given the factorization: cross gram
    2NPD + two triangular solves with P rhs (2 N^2 P)."""
    return 2.0 * N * P * D + 2.0 * N**2 * P


def sgpr_elbo_flops(N: int, M: int, D: int) -> float:
    """One forward evaluation of the collapsed Titsias bound
    (models/sgpr.py _common_terms; identical whether chunked or not):

      Kuu gram + chol        2 M^2 D + M^3/3
      Kuf gram               2 N M D
      A = L^-1 Kuf           N M^2        (triangular, N rhs)
      AAT                    2 N M^2
      LB chol + small        M^3/3 + O(M^2)
    """
    return 3.0 * N * M**2 + 2.0 * N * M * D + (2.0 / 3.0) * M**3 + 2.0 * M**2 * D


def sgpr_iter_flops(N: int, M: int, D: int, ad_factor: float = 3.0) -> float:
    """One L-BFGS iteration = value + reverse-mode gradient of the bound.
    Reverse-mode over matmul-dominated code costs ~2x the forward on top
    of it (standard AD bound); ad_factor=3 counts forward + backward."""
    return ad_factor * sgpr_elbo_flops(N, M, D)


def svgp_elbo_flops(N: int, M: int, D: int) -> float:
    """One forward SVGP ELBO on a full tile: Kuu chol M^3/3, Kus gram
    2NMD, A = L^-1 Kus (N M^2), SA = q_sqrt^T A (2 N M^2), reductions."""
    return 3.0 * N * M**2 + 2.0 * N * M * D + (1.0 / 3.0) * M**3


def svgp_iter_flops(N: int, M: int, D: int, ad_factor: float = 3.0) -> float:
    """One Adam iteration = value + reverse-mode gradient."""
    return ad_factor * svgp_elbo_flops(N, M, D)


# Single-chip matmul ceilings for context (marketing peak, dense matmul):
# v5e ~197 TFLOP/s bf16; with jax_default_matmul_precision=highest each f32
# matmul runs ~6 bf16 MXU passes -> ~33 TFLOP/s effective f32 ceiling.
# Cholesky/triangular work is additionally SEQUENTIAL-latency-bound at
# small N (the measured wall for this workload — docs/architecture.md).
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_F32_HIGHEST_TFLOPS = 33.0
