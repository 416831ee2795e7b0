"""Stacked-panel Cholesky kernel (ops/pallas/panel_chol) — correctness in
interpret mode, and the custom_vmap-routed fused-LML panel path vs the
reference path (values and analytic gradients)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsat_tpu.ops import linalg as LA
from gpsat_tpu.ops.pallas.panel_chol import factor_panels


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("GPSAT_PALLAS_INTERPRET", "1")


class TestPanelKernel:
    def test_factor_panels_matches_numpy(self):
        rng = np.random.default_rng(0)
        B, T = 5, 128
        A = rng.standard_normal((B, T, T)).astype(np.float32)
        K = A @ np.swapaxes(A, 1, 2) + T * np.eye(T, dtype=np.float32)
        L, Inv = factor_panels(jnp.asarray(K), interpret=True)
        L, Inv = np.asarray(L), np.asarray(Inv)
        np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=0, atol=2e-4)
        np.testing.assert_allclose(L @ Inv, np.broadcast_to(np.eye(T), (B, T, T)), atol=2e-5)
        assert np.max(np.abs(np.triu(L[0], 1))) == 0.0

    def test_batched_blocked_driver(self):
        rng = np.random.default_rng(1)
        B, N = 4, 384
        A = rng.standard_normal((B, N, N)).astype(np.float32) / np.sqrt(N)
        K = A @ np.swapaxes(A, 1, 2) + np.eye(N, dtype=np.float32)
        L, Wdiag = LA._chol_panels_batched(jnp.asarray(K))
        Lref = np.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(L), Lref, atol=5e-4)
        # solve/inverse helpers built on the diag-block inverses
        W = jax.vmap(LA.tri_inv_from_diag)(L, Wdiag)
        np.testing.assert_allclose(
            np.asarray(jnp.matmul(W, L)), np.broadcast_to(np.eye(N), (B, N, N)), atol=2e-4
        )
        b = jnp.asarray(rng.standard_normal((B, N, 1)).astype(np.float32))
        v = jax.vmap(LA.tri_solve_from_diag)(L, Wdiag, b)
        vref = jax.vmap(lambda Lb, bb: jax.scipy.linalg.solve_triangular(Lb, bb, lower=True))(
            jnp.asarray(Lref), b
        )
        np.testing.assert_allclose(np.asarray(v), np.asarray(vref), atol=2e-4)

    def test_fused_lml_panel_path_matches_reference(self, monkeypatch):
        from gpsat_tpu.ops.fused_lml import masked_gpr_lml_fused

        rng = np.random.default_rng(2)
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

        monkeypatch.setenv("GPSAT_PALLAS_PANEL", "force")
        jax.clear_caches()
        val_p, grads_p = vg(X, y, m, ls, kv, lv)
        monkeypatch.setenv("GPSAT_PALLAS_PANEL", "0")
        jax.clear_caches()
        val_r, grads_r = vg(X, y, m, ls, kv, lv)

        np.testing.assert_allclose(np.asarray(val_p), np.asarray(val_r), rtol=1e-5, atol=1e-3)
        for gp, gr in zip(grads_p, grads_r):
            scale = max(float(jnp.max(jnp.abs(gr))), 1.0)
            np.testing.assert_allclose(
                np.asarray(gp) / scale, np.asarray(gr) / scale, atol=5e-5
            )
