"""Pallas blocked-Cholesky correctness (interpreter mode on CPU).

The real-TPU path is exercised by bench.py; here the same kernel runs
under pltpu.force_tpu_interpret_mode so CI validates the algorithm.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import gpsat_tpu.ops.pallas.cholesky as pc


def _spd(B, N, rank=16, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, N, rank)).astype(dtype)
    return jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + np.eye(N, dtype=dtype)[None])


class TestPallasCholesky:
    @pytest.mark.parametrize("N", [128, 256, 512])
    def test_matches_lapack(self, N):
        K = _spd(2, N)
        with pltpu.force_tpu_interpret_mode():
            L = pc._pallas_chol_batched(K)
        Lref = np.linalg.cholesky(np.asarray(K))
        rel = np.abs(np.asarray(L) - Lref).max() / np.abs(Lref).max()
        assert rel < 5e-6, f"rel error {rel}"
        # strictly lower-triangular output
        assert np.allclose(np.triu(np.asarray(L), 1), 0.0)

    def test_custom_vjp_matches_jnp(self):
        # gradient of sum(log diag L) == d/dK of 0.5 logdet
        K = _spd(1, 128, dtype=np.float64).astype(jnp.float32)

        def f_pallas(K):
            with pltpu.force_tpu_interpret_mode():
                L = pc._pallas_chol_batched(K)
            return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

        def f_ref(K):
            L = jnp.linalg.cholesky(K)
            return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

        # pallas fwd + our custom bwd formula
        def f_custom(K):
            with pltpu.force_tpu_interpret_mode():
                L, _ = pc._chol_fwd(K)
            dL = jax.grad(lambda l: jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1))))(L)
            (dK,) = pc._chol_bwd(L, dL)
            return dK

        g_ref = jax.grad(f_ref)(K)
        g_custom = f_custom(K)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref), rtol=2e-3, atol=1e-5)

    def test_fallback_off_tpu(self):
        # on CPU the public entry must silently use jnp.linalg.cholesky
        K = _spd(2, 64)
        L = pc.cholesky(K)
        # f32 jnp vs f64 numpy reference
        np.testing.assert_allclose(
            np.asarray(L), np.linalg.cholesky(np.asarray(K, dtype=np.float64)), rtol=1e-3, atol=1e-4
        )
