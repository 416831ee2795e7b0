"""TPU-hardware smoke tests (opt-in: `pytest -m tpu`).

CPU CI runs Pallas kernels in interpret mode, which skips Mosaic
lowering entirely — so Mosaic-only regressions (e.g. the layout-
inference crash fixed by the chained single-axis reductions in
ops/pallas/block_chol.py:62-68, "Check failed: arr.size() >=
layout_rank(implicit_dim)" on libtpu 2026-08) pass CPU CI silently.
These tests compile the kernels on real hardware in a subprocess
(tests/conftest.py pins this process to the CPU backend, and the axon
relay only dials on first device touch, so a fresh interpreter is the
only clean way to reach the TPU from the suite).

Excluded from the default run (addopts -m "not tpu"); they also carry
the slow marker. First TPU touch dials the tunnel (~4-5 min) and the
compile can take minutes — budget ~15 min.
"""

import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

_SMOKE = r"""
import sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
if all(d.platform == "cpu" for d in jax.devices()):
    sys.exit(42)  # no accelerator attached -> skip

from gpsat_tpu.ops.pallas.block_chol import factor_blocks
from gpsat_tpu.ops import linalg as LA

rng = np.random.default_rng(0)
T = 64
A = rng.standard_normal((4, T, T)).astype(np.float32) / np.sqrt(T)
K = jnp.asarray(A @ np.swapaxes(A, 1, 2) + np.eye(T, dtype=np.float32))

# Mosaic lowering (interpret=False) is the entire point of this test:
# the chained single-axis reductions in _cholinv_kernel must keep
# compiling on real libtpu
L, W = jax.jit(lambda k: factor_blocks(k, interpret=False))(K)
L, W = np.asarray(L), np.asarray(W)
L_ref = np.asarray(jax.vmap(LA.cholesky)(K))
assert np.isfinite(L).all() and np.isfinite(W).all()
np.testing.assert_allclose(L, L_ref, atol=5e-4, rtol=5e-4)
eye = np.eye(T, dtype=np.float32)
np.testing.assert_allclose(W @ L, np.broadcast_to(eye, L.shape), atol=5e-3)
print("block_chol mosaic smoke ok")
"""


def test_block_chol_compiles_under_mosaic():
    """factor_blocks must lower through Mosaic on real TPU hardware
    (regression guard for the layout-inference crash; ADVICE r3)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon sitecustomize pick the TPU
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SMOKE], env=env,
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode == 42:
        pytest.skip("no accelerator attached (CPU-only environment)")
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "mosaic smoke ok" in proc.stdout
