"""Matmul precision policy for the f32 compute paths.

TPU MXU matmuls natively take bf16 inputs; f32 matmuls are emulated by
splitting each operand into bf16 limbs (jax ``precision``):

- ``HIGHEST``: 6-pass split — slightly better than native f32.
- ``HIGH``: 3-pass split — ~2x MXU throughput, f32-comparable per-element
  error but no headroom.

Measured A/B (BENCH_LARGE_N, SGPR M=500): flipping EVERY pinned matmul to
HIGH breaks the solver outright — 0/8 lanes converge, 0 iterations (the
first objective eval NaNs). The killer is the conditioning-critical
class: the squared-distance cross product (|a|^2+|b|^2-2ab cancellation,
amplified by the far-away inducing pads) and the blocked triangular
inverse that feed the Cholesky. Those stay hard-pinned at HIGHEST.

What CAN tolerate HIGH is the accumulation class: the chunked large-N
SGPR contractions ``A_i = W @ Kuf_i`` and ``AAT += A_i @ A_i.T``
(2*M^2*C FLOPs each — essentially all FLOPs at N >> M). Their target
``B = AAT + I`` has eigenvalues >= 1, so a ~1e-7-relative perturbation
of AAT cannot break the LB Cholesky; it only jiggles the bound/gradient
at f32 noise level.

``GPSAT_MM_PRECISION=high`` flips that accumulation class only; default
``highest``. Read at trace time — set it before the first jit.
"""

from __future__ import annotations

import os

import jax

_LEVELS = {
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def accum_precision():
    """Precision for the conditioning-safe accumulation matmuls (the
    chunked SGPR N-contractions). NOT for Gram cross products or
    triangular-inverse updates — those require HIGHEST (see module doc)."""
    name = os.environ.get("GPSAT_MM_PRECISION", "highest").lower()
    if name not in _LEVELS:
        raise ValueError(
            f"GPSAT_MM_PRECISION={name!r}: expected one of {sorted(_LEVELS)}"
        )
    return _LEVELS[name]
