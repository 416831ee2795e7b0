"""Fused diag-block Cholesky+inverse kernel (ops/pallas/block_chol) —
correctness in interpret mode, the batched blocked driver, NaN propagation
for the safe_cholesky failure contract, and the custom_vmap-routed fused-LML
block path vs the reference path (values and analytic gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsat_tpu.ops import linalg as LA
from gpsat_tpu.ops.pallas.block_chol import factor_blocks


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("GPSAT_PALLAS_INTERPRET", "1")


class TestBlockKernel:
    def test_factor_blocks_matches_numpy(self):
        rng = np.random.default_rng(0)
        B, T = 7, 64
        A = rng.standard_normal((B, T, T)).astype(np.float32)
        K = A @ np.swapaxes(A, 1, 2) + T * np.eye(T, dtype=np.float32)
        L, W = factor_blocks(jnp.asarray(K), interpret=True)
        L, W = np.asarray(L), np.asarray(W)
        np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=0, atol=2e-4)
        np.testing.assert_allclose(L @ W, np.broadcast_to(np.eye(T), (B, T, T)), atol=2e-5)
        assert np.max(np.abs(np.triu(L[0], 1))) == 0.0
        assert np.max(np.abs(np.triu(W[0], 1))) == 0.0

    def test_non_spd_block_propagates_nan(self):
        # safe_cholesky's ok-flag relies on a failed factorization producing
        # NaNs — the kernel must not clamp the pivot
        K = np.stack([
            np.eye(64, dtype=np.float32),
            -np.eye(64, dtype=np.float32),
        ])
        L, W = factor_blocks(jnp.asarray(K), interpret=True)
        assert np.all(np.isfinite(np.asarray(L[0])))
        assert np.any(np.isnan(np.asarray(L[1]))) and np.any(np.isnan(np.asarray(W[1])))

    def test_batched_winv_driver(self):
        rng = np.random.default_rng(1)
        B, N = 3, 320  # non-power-of-two multiple of 64
        A = rng.standard_normal((B, N, N)).astype(np.float32) / np.sqrt(N)
        K = A @ np.swapaxes(A, 1, 2) + np.eye(N, dtype=np.float32)
        L, W = LA._chol_winv_batched(jnp.asarray(K))
        Lref = np.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(L), Lref, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(jnp.matmul(W, L)), np.broadcast_to(np.eye(N), (B, N, N)), atol=3e-4
        )
        # strict upper triangle of W is zero (block assembly fills zeros)
        assert np.max(np.abs(np.triu(np.asarray(W)[0], 1))) == 0.0

    def test_chol_winv_custom_vjp_matches_autodiff(self, monkeypatch):
        # the differentiable wrapper (for consumers whose gradients flow
        # through the factorization: SGPR/SVGP/VFF) vs plain autodiff
        # through cholesky + solve_triangular
        rng = np.random.default_rng(3)
        N = 96
        A = rng.standard_normal((N, N))
        K = jnp.asarray(A @ A.T + N * np.eye(N))

        def f_new(K):
            L, W = LA.chol_winv(K)
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(jnp.sin(W)) + jnp.sum(W @ jnp.ones(N, K.dtype))

        def f_ref(K):
            L = jnp.linalg.cholesky(K)
            W = jax.scipy.linalg.solve_triangular(L, jnp.eye(N, dtype=K.dtype), lower=True)
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(jnp.sin(W)) + jnp.sum(W @ jnp.ones(N, K.dtype))

        g_new = jax.grad(f_new)(K)
        g_ref = jax.grad(f_ref)(K)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-9)

        # vmapped through the forced kernel path (f32, interpret mode)
        monkeypatch.setenv("GPSAT_BLOCK_CHOL", "force")
        jax.clear_caches()
        B, N2 = 3, 128
        A2 = rng.standard_normal((B, N2, N2)).astype(np.float32) / np.sqrt(N2)
        K2 = jnp.asarray(A2 @ np.swapaxes(A2, 1, 2) + np.eye(N2, dtype=np.float32))

        def fb(K):
            L, W = LA.chol_winv(K)
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(W * W)

        gv_new = jax.vmap(jax.grad(fb))(K2)
        monkeypatch.setenv("GPSAT_BLOCK_CHOL", "0")
        jax.clear_caches()

        def fb_ref(K):
            L = jnp.linalg.cholesky(K)
            W = jax.scipy.linalg.solve_triangular(L, jnp.eye(N2, dtype=K.dtype), lower=True)
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(W * W)

        gv_ref = jax.vmap(jax.grad(fb_ref))(K2)
        scale = float(jnp.max(jnp.abs(gv_ref)))
        np.testing.assert_allclose(
            np.asarray(gv_new) / scale, np.asarray(gv_ref) / scale, atol=2e-6
        )

    def test_sgpr_block_path_matches_reference(self, monkeypatch):
        # SGPR routes its (L, Winv) Kuu factor, the B-factor + c solve, and
        # the predict solves through the kernel path; M=100 exercises the
        # identity padding (chol_winv_padded)
        from gpsat_tpu.models import sgpr as S

        LA.set_fast_inverse(True)
        try:
            rng = np.random.default_rng(4)
            N, M, D, P = 256, 100, 2, 16
            X = rng.uniform(-4, 4, (N, D)).astype(np.float32)
            y = (np.sin(X[:, 0]) + 0.1 * rng.standard_normal(N)).astype(np.float32)
            mask = np.ones(N, np.float32)
            mask[200:] = 0
            Z = X[rng.choice(N, M, replace=False)].copy()
            Xnew = rng.uniform(-3, 3, (P, D)).astype(np.float32)
            data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.asarray(mask)}
            cp = {
                "inducing_points": jnp.asarray(Z),
                "lengthscales": jnp.full((D,), 1.2, jnp.float32),
                "kernel_variance": jnp.asarray(0.8, jnp.float32),
                "likelihood_variance": jnp.asarray(0.05, jnp.float32),
            }

            def run():
                e = S.elbo(cp, data, kernel="Matern32")
                pr = S.predict(cp, data, jnp.asarray(Xnew), kernel="Matern32")

                def f(ls, chunk):
                    c2 = dict(cp)
                    c2["lengthscales"] = ls
                    return S.elbo(c2, data, kernel="Matern32", chunk_size=chunk)

                g = jax.grad(f)(cp["lengthscales"], None)
                gc = jax.grad(f)(cp["lengthscales"], 64)  # remat-scan backward
                return e, pr, g, gc

            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "force")
            jax.clear_caches()
            e_b, pr_b, g_b, gc_b = run()
            e_c = S.elbo(cp, data, kernel="Matern32", chunk_size=64)
            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "0")
            jax.clear_caches()
            e_r, pr_r, g_r, gc_r = run()

            assert abs(float(e_b - e_r)) < 1e-2
            assert abs(float(e_c - e_r)) < 1e-2
            for k in pr_b:
                np.testing.assert_allclose(np.asarray(pr_b[k]), np.asarray(pr_r[k]), atol=5e-4)
            s = max(float(jnp.max(jnp.abs(g_r))), 1.0)
            np.testing.assert_allclose(
                np.asarray(g_b) / s, np.asarray(g_r) / s, atol=5e-4
            )
            np.testing.assert_allclose(np.asarray(gc_b) / s, np.asarray(gc_r) / s, atol=5e-4)
            np.testing.assert_allclose(np.asarray(gc_r) / s, np.asarray(g_r) / s, atol=5e-4)
        finally:
            LA.set_fast_inverse(None)

    def test_gpr_posterior_block_path_matches_reference(self, monkeypatch):
        # production GPR predictions ride posterior_factors' chol_winv_pair
        # route; vmap over tiles so the batched (Pallas) rule is the one
        # under test, and compare mean/var/cov vs the default path
        from gpsat_tpu.models import gpr as G

        LA.set_fast_inverse(True)
        try:
            rng = np.random.default_rng(6)
            B, N, D, P = 3, 128, 2, 8
            X = rng.uniform(-4, 4, (B, N, D)).astype(np.float32)
            y = (np.sin(X[..., 0]) + 0.1 * rng.standard_normal((B, N))).astype(np.float32)
            mask = np.ones((B, N), np.float32)
            mask[:, 100:] = 0
            Xnew = rng.uniform(-3, 3, (B, P, D)).astype(np.float32)
            cp = {
                "lengthscales": jnp.full((D,), 1.1, jnp.float32),
                "kernel_variance": jnp.asarray(0.9, jnp.float32),
                "likelihood_variance": jnp.asarray(0.05, jnp.float32),
            }

            def one(Xi, yi, mi, Xn):
                return G.predict(
                    cp, {"X": Xi, "y": yi, "mask": mi}, Xn,
                    kernel="Matern32", jitter=1e-5, full_cov=True,
                )

            def run():
                return jax.vmap(one)(
                    jnp.asarray(X), jnp.asarray(y), jnp.asarray(mask), jnp.asarray(Xnew)
                )

            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "force")
            jax.clear_caches()
            pr_b = run()
            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "0")
            jax.clear_caches()
            pr_r = run()
            for k in pr_r:
                np.testing.assert_allclose(
                    np.asarray(pr_b[k]), np.asarray(pr_r[k]), atol=5e-4, err_msg=k
                )
        finally:
            LA.set_fast_inverse(None)

    def test_svgp_block_path_matches_reference(self, monkeypatch):
        # whitened-ELBO marginals route A = L^-1 Kus through the
        # materialized W on the kernel path (full and chunked)
        from gpsat_tpu.models import svgp as V

        LA.set_fast_inverse(True)
        try:
            rng = np.random.default_rng(5)
            N, M, D = 192, 100, 2
            X = rng.uniform(-4, 4, (N, D)).astype(np.float32)
            y = (np.sin(X[:, 0]) + 0.1 * rng.standard_normal(N)).astype(np.float32)
            Z = X[rng.choice(N, M, replace=False)].copy()
            cp = {
                "inducing_points": jnp.asarray(Z),
                "lengthscales": jnp.full((D,), 1.2, jnp.float32),
                "kernel_variance": jnp.asarray(0.8, jnp.float32),
                "likelihood_variance": jnp.asarray(0.05, jnp.float32),
                "inducing_mean": jnp.asarray(0.1 * rng.standard_normal(M).astype(np.float32)),
                "inducing_chol": jnp.asarray(np.eye(M, dtype=np.float32) * 0.5),
            }
            data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.ones(N, jnp.float32)}

            def run():
                e = V.elbo(cp, data, kernel="Matern32")
                ec = V.elbo(cp, data, kernel="Matern32", chunk_size=64)

                def f(ls, chunk):
                    c2 = dict(cp)
                    c2["lengthscales"] = ls
                    return V.elbo(c2, data, kernel="Matern32", chunk_size=chunk)

                g = jax.grad(f)(cp["lengthscales"], None)
                gc = jax.grad(f)(cp["lengthscales"], 64)  # remat-scan backward
                return e, ec, g, gc

            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "force")
            jax.clear_caches()
            e_b, ec_b, g_b, gc_b = run()
            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "0")
            jax.clear_caches()
            e_r, ec_r, g_r, gc_r = run()

            assert abs(float(e_b - e_r)) < 1e-2
            assert abs(float(ec_b - ec_r)) < 1e-2
            s = max(float(jnp.max(jnp.abs(g_r))), 1.0)
            np.testing.assert_allclose(np.asarray(g_b) / s, np.asarray(g_r) / s, atol=5e-4)
            np.testing.assert_allclose(np.asarray(gc_b) / s, np.asarray(gc_r) / s, atol=5e-4)
            np.testing.assert_allclose(np.asarray(gc_r) / s, np.asarray(g_r) / s, atol=5e-4)
        finally:
            LA.set_fast_inverse(None)

    @pytest.mark.parametrize("family", ["vff", "asvgp"])
    def test_spectral_models_block_path_matches_reference(self, monkeypatch, family):
        # VFF/ASVGP factor P = KufKfu/s2 + Kuu through the kernel path:
        # elbo value, lengthscale gradient, and predictions
        from gpsat_tpu.models import asvgp as AS
        from gpsat_tpu.models import vff as VF

        LA.set_fast_inverse(True)
        try:
            rng = np.random.default_rng(6)
            N, D = 200, 2
            X = rng.uniform(-2, 2, (N, D)).astype(np.float32)
            y = (np.sin(X[:, 0]) + 0.1 * rng.standard_normal(N)).astype(np.float32)
            data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.ones(N, jnp.float32)}
            Xnew = jnp.asarray(rng.uniform(-1.5, 1.5, (12, D)).astype(np.float32))
            cp = {
                "lengthscales": jnp.full((D,), 0.9, jnp.float32),
                "kernel_variance": jnp.asarray(0.7, jnp.float32),
                "likelihood_variance": jnp.asarray(0.05, jnp.float32),
            }
            if family == "vff":
                kw = dict(kernel="Matern32", a=[-3.0, -3.0], b=[3.0, 3.0], M=5)
                ef = lambda c: VF.elbo(c, data, **kw)  # noqa: E731
                pf = lambda c: VF.predict(c, data, Xnew, **kw)  # noqa: E731
            else:
                knots = [np.linspace(-3, 3, 13), np.linspace(-3, 3, 13)]
                ef = lambda c: AS.elbo(c, data, knots, kernel="Matern32")  # noqa: E731
                pf = lambda c: AS.predict(c, data, Xnew, knots, kernel="Matern32")  # noqa: E731

            def run():
                e = ef(cp)
                pr = pf(cp)
                g = jax.grad(lambda ls: ef({**cp, "lengthscales": ls}))(cp["lengthscales"])
                return e, pr, g

            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "force")
            jax.clear_caches()
            e_b, pr_b, g_b = run()
            monkeypatch.setenv("GPSAT_BLOCK_CHOL", "0")
            jax.clear_caches()
            e_r, pr_r, g_r = run()

            assert abs(float(e_b - e_r)) < 5e-2
            for k in pr_b:
                np.testing.assert_allclose(np.asarray(pr_b[k]), np.asarray(pr_r[k]), atol=2e-3)
            s = max(float(jnp.max(jnp.abs(g_r))), 1.0)
            np.testing.assert_allclose(np.asarray(g_b) / s, np.asarray(g_r) / s, atol=5e-4)
        finally:
            LA.set_fast_inverse(None)

    def test_fused_lml_block_path_matches_reference(self, monkeypatch):
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

        monkeypatch.setenv("GPSAT_BLOCK_CHOL", "force")
        jax.clear_caches()
        val_b, grads_b = vg(X, y, m, ls, kv, lv)
        monkeypatch.setenv("GPSAT_BLOCK_CHOL", "0")
        jax.clear_caches()
        val_r, grads_r = vg(X, y, m, ls, kv, lv)

        np.testing.assert_allclose(np.asarray(val_b), np.asarray(val_r), rtol=1e-5, atol=1e-3)
        for gb, gr in zip(grads_b, grads_r):
            scale = max(float(jnp.max(jnp.abs(gr))), 1.0)
            np.testing.assert_allclose(
                np.asarray(gb) / scale, np.asarray(gr) / scale, atol=5e-5
            )
