"""Recursive factor pair (ops/recursive_chol) — correctness vs LAPACK,
vmap batching, NaN propagation for the safe-factorization contract, and
the GPSAT_RECURSIVE_CHOL-routed fused-LML path vs the reference path
(values and analytic gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsat_tpu.ops import linalg as LA
from gpsat_tpu.ops.recursive_chol import chol_winv_recursive


def _spd(rng, n, dtype=np.float64, scale=None):
    Q = rng.standard_normal((n, n)).astype(dtype)
    return Q @ Q.T + (scale if scale is not None else n) * np.eye(n, dtype=dtype)


class TestFactorPair:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 32, 33, 100, 128, 257])
    def test_matches_lapack_f64(self, n):
        rng = np.random.default_rng(n)
        A = _spd(rng, n)
        L, W = chol_winv_recursive(jnp.asarray(A))
        L, W = np.asarray(L), np.asarray(W)
        Lg = np.linalg.cholesky(A)
        np.testing.assert_allclose(L, Lg, atol=1e-12)
        np.testing.assert_allclose(W @ Lg, np.eye(n), atol=1e-12)
        # strict upper triangles are exactly zero (assembled, not computed)
        assert np.max(np.abs(np.triu(L, 1))) == 0.0
        assert np.max(np.abs(np.triu(W, 1))) == 0.0

    def test_f32_tolerance(self):
        rng = np.random.default_rng(0)
        A = _spd(rng, 192, np.float32, scale=8.0)
        L, W = chol_winv_recursive(jnp.asarray(A))
        assert L.dtype == jnp.float32 and W.dtype == jnp.float32
        Lg = np.linalg.cholesky(A.astype(np.float64))
        np.testing.assert_allclose(np.asarray(L), Lg, atol=5e-4)
        np.testing.assert_allclose(np.asarray(W) @ Lg, np.eye(192), atol=5e-4)

    def test_vmap_batch(self):
        rng = np.random.default_rng(1)
        K = np.stack([_spd(rng, 96) for _ in range(5)])
        L, W = jax.vmap(chol_winv_recursive)(jnp.asarray(K))
        np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(K), atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(jnp.matmul(W, L)), np.broadcast_to(np.eye(96), (5, 96, 96)), atol=1e-11
        )

    def test_masked_gram_padding_rows(self):
        # the engine's unit-diagonal padded rows must factor to unit rows
        # and leave the valid block identical to the unpadded problem
        rng = np.random.default_rng(2)
        n, pad = 48, 16
        A = _spd(rng, n)
        Ap = np.eye(n + pad)
        Ap[:n, :n] = A
        L, W = chol_winv_recursive(jnp.asarray(Ap))
        Ls, Ws = chol_winv_recursive(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(L)[:n, :n], np.asarray(Ls), atol=1e-13)
        np.testing.assert_allclose(np.asarray(W)[:n, :n], np.asarray(Ws), atol=1e-13)
        np.testing.assert_allclose(np.asarray(L)[n:, n:], np.eye(pad), atol=0)

    def test_non_spd_propagates_nan(self):
        # safe_cholesky's ok-flag contract: no pivot clamping
        L, W = chol_winv_recursive(jnp.asarray(-np.eye(64)))
        assert np.any(np.isnan(np.asarray(L))) and np.any(np.isnan(np.asarray(W)))

    def test_base_sweep(self):
        rng = np.random.default_rng(3)
        A = jnp.asarray(_spd(rng, 160))
        ref = np.linalg.cholesky(np.asarray(A))
        for base in (8, 16, 32, 64, 256):
            L, _ = chol_winv_recursive(A, base=base)
            np.testing.assert_allclose(np.asarray(L), ref, atol=1e-11, err_msg=f"base={base}")


class TestFusedPath:
    def test_fused_lml_recursive_path_matches_reference(self, monkeypatch):
        from gpsat_tpu.ops.fused_lml import masked_gpr_lml_fused

        rng = np.random.default_rng(4)
        B, N, D = 3, 256, 2
        X = jnp.asarray(rng.uniform(-3, 3, (B, N, D)).astype(np.float32))
        y = jnp.asarray(
            (np.sin(np.asarray(X)[..., 0]) + 0.1 * rng.standard_normal((B, N))).astype(np.float32)
        )
        m = np.ones((B, N), np.float32)
        m[:, 200:] = 0
        m = jnp.asarray(m)
        ls = jnp.asarray(np.full((B, D), 1.3, np.float32))
        kv = jnp.full((B,), 0.9, jnp.float32)
        lv = jnp.full((B,), 0.05, jnp.float32)

        def f(X, y, m, ls, kv, lv):
            return masked_gpr_lml_fused("Matern32", X, y, m, ls, kv, lv, 1e-5)

        vg = jax.vmap(jax.value_and_grad(f, argnums=(3, 4, 5)), in_axes=(0,) * 6)

        monkeypatch.setenv("GPSAT_RECURSIVE_CHOL", "force")
        jax.clear_caches()
        val_a, grads_a = vg(X, y, m, ls, kv, lv)
        monkeypatch.setenv("GPSAT_RECURSIVE_CHOL", "0")
        jax.clear_caches()
        val_r, grads_r = vg(X, y, m, ls, kv, lv)

        np.testing.assert_allclose(np.asarray(val_a), np.asarray(val_r), rtol=1e-5, atol=1e-3)
        for ga, gr in zip(grads_a, grads_r):
            scale = max(float(jnp.max(jnp.abs(gr))), 1.0)
            np.testing.assert_allclose(
                np.asarray(ga) / scale, np.asarray(gr) / scale, atol=5e-5
            )

    def test_gate_off_on_cpu_without_force(self, monkeypatch):
        monkeypatch.setenv("GPSAT_RECURSIVE_CHOL", "1")
        assert not LA.recursive_path_enabled(jnp.zeros((4, 4), jnp.float32))
        monkeypatch.setenv("GPSAT_RECURSIVE_CHOL", "force")
        assert LA.recursive_path_enabled(jnp.zeros((4, 4), jnp.float32))
        monkeypatch.setenv("GPSAT_RECURSIVE_CHOL", "0")
        assert not LA.recursive_path_enabled(jnp.zeros((4, 4), jnp.float32))
