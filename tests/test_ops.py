"""Unit tests for gpsat_tpu.ops — kernels, transforms, masked linalg.

Mirrors the reference's pure-function tier (SURVEY.md §4): Gram math checked
against sklearn's Matern/RBF, transforms round-trip, and the padding
invariance that the whole batched design rests on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn.gaussian_process.kernels import RBF as skRBF, Matern as skMatern

from gpsat_tpu.ops import kernels as K
from gpsat_tpu.ops import linalg as LA
from gpsat_tpu.ops import transforms as T

rng = np.random.default_rng(42)


class TestKernels:
    X1 = rng.normal(size=(20, 3))
    X2 = rng.normal(size=(15, 3))

    @pytest.mark.parametrize(
        "name,sk",
        [
            ("RBF", skRBF(length_scale=[0.7, 1.3, 2.1])),
            ("Matern12", skMatern(length_scale=[0.7, 1.3, 2.1], nu=0.5)),
            ("Matern32", skMatern(length_scale=[0.7, 1.3, 2.1], nu=1.5)),
            ("Matern52", skMatern(length_scale=[0.7, 1.3, 2.1], nu=2.5)),
        ],
    )
    def test_vs_sklearn(self, name, sk):
        ls = np.array([0.7, 1.3, 2.1])
        var = 2.3
        ours = K.gram(name, jnp.asarray(self.X1), jnp.asarray(self.X2), jnp.asarray(ls), var)
        theirs = var * sk(self.X1, self.X2)
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-10, atol=1e-10)

    def test_symmetric_and_psd(self):
        for name in ["RBF", "Matern12", "Matern32", "Matern52", "RationalQuadratic"]:
            G = np.asarray(K.gram(name, jnp.asarray(self.X1), jnp.asarray(self.X1), 1.0, 1.0))
            np.testing.assert_allclose(G, G.T, atol=1e-12)
            w = np.linalg.eigvalsh(G + 1e-10 * np.eye(len(G)))
            assert w.min() > -1e-8

    def test_grad_at_zero_distance_finite(self):
        # r = 0 pairs must not produce NaN gradients (sqrt at 0)
        X = jnp.asarray(self.X1)

        def f(ls):
            return jnp.sum(K.gram("Matern32", X, X, ls, 1.0))

        g = jax.grad(f)(jnp.ones(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestTransforms:
    def test_softplus_roundtrip(self):
        x = np.linspace(-20, 20, 101)
        y = T.softplus(jnp.asarray(x))
        x2 = T.inverse_softplus(y)
        np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-8, atol=1e-8)

    def test_sigmoid_roundtrip(self):
        x = np.linspace(-10, 10, 101)
        y = T.sigmoid_lh(jnp.asarray(x), 0.5, 4.5)
        assert np.all((np.asarray(y) > 0.5) & (np.asarray(y) < 4.5))
        x2 = T.inverse_sigmoid_lh(y, 0.5, 4.5)
        np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-7, atol=1e-7)

    def test_inverse_softplus_out_of_domain(self):
        assert np.asarray(T.inverse_softplus(jnp.asarray(-1.0))) == -np.inf

    def test_move_within_tol(self):
        vals = T.move_within_tol(np.array([0.0, 5.0, 2.0]), 1.0, 4.0, tol=1e-2)
        np.testing.assert_allclose(vals, [1.01, 3.99, 2.0])


class TestMaskedLinalg:
    def test_padding_invariance_lml(self):
        # lml of a padded tile == lml of the exact subset
        N, D, pad = 30, 2, 11
        X = rng.normal(size=(N, D))
        y = rng.normal(size=(N,))
        Xp = np.concatenate([X, rng.normal(size=(pad, D))], axis=0)
        yp = np.concatenate([y, rng.normal(size=(pad,))])
        mask = np.concatenate([np.ones(N), np.zeros(pad)])

        args = dict(lengthscales=jnp.asarray([0.9, 1.4]), kernel_variance=1.7, likelihood_variance=0.05)
        lml_exact = LA.masked_gpr_lml(jnp.asarray(X), jnp.asarray(y), jnp.ones(N), **args)
        lml_pad = LA.masked_gpr_lml(jnp.asarray(Xp), jnp.asarray(yp), jnp.asarray(mask), **args)
        np.testing.assert_allclose(float(lml_pad), float(lml_exact), rtol=1e-10)

    def test_padding_invariance_grad(self):
        N, D, pad = 25, 2, 7
        X = rng.normal(size=(N, D))
        y = rng.normal(size=(N,))
        Xp = np.concatenate([X, np.zeros((pad, D))], axis=0)
        yp = np.concatenate([y, np.zeros(pad)])
        mask = np.concatenate([np.ones(N), np.zeros(pad)])

        def lml(ls, Xa, ya, m):
            return LA.masked_gpr_lml(Xa, ya, m, ls, 1.0, 0.1)

        g_exact = jax.grad(lml)(jnp.asarray([1.0, 1.0]), jnp.asarray(X), jnp.asarray(y), jnp.ones(N))
        g_pad = jax.grad(lml)(jnp.asarray([1.0, 1.0]), jnp.asarray(Xp), jnp.asarray(yp), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(g_pad), np.asarray(g_exact), rtol=1e-9)

    def test_mask_gram_identity_rows(self):
        Km = LA.mask_gram(jnp.full((4, 4), 9.0), jnp.asarray([1.0, 0.0, 1.0, 0.0]))
        Km = np.asarray(Km)
        assert Km[1, 1] == 1.0 and Km[3, 3] == 1.0
        assert Km[0, 1] == 0.0 and Km[1, 2] == 0.0
        assert Km[0, 2] == 9.0


class TestFastInverse:
    def test_tri_inv_blocked_matches_solve(self):
        from gpsat_tpu.ops.linalg import tri_inv_blocked

        rng2 = np.random.default_rng(5)
        for N in (128, 256, 512):
            A = rng2.normal(size=(N, 24))
            K = A @ A.T + np.eye(N)
            L = np.linalg.cholesky(K)
            W = np.asarray(tri_inv_blocked(jnp.asarray(L)))
            np.testing.assert_allclose(W @ L, np.eye(N), atol=1e-8)

    def test_fast_lml_matches_solve_path(self):
        from gpsat_tpu.ops import linalg as LA2

        rng2 = np.random.default_rng(6)
        N = 256
        X = rng2.uniform(0, 5, size=(N, 2))
        y = np.sin(X[:, 0]) + 0.1 * rng2.normal(size=N)
        mask = np.ones(N)
        mask[-30:] = 0.0
        args = (jnp.asarray(X), jnp.asarray(y), jnp.asarray(mask), jnp.asarray([1.0, 1.5]), 1.2, 0.05)
        LA2.set_fast_inverse(False)
        ref = float(LA2.masked_gpr_lml(*args))
        LA2.set_fast_inverse(True)
        fast = float(LA2.masked_gpr_lml(*args))
        LA2.set_fast_inverse(None)
        np.testing.assert_allclose(fast, ref, rtol=1e-10)


class TestFusedLML:
    @pytest.mark.parametrize("kernel", ["Matern12", "Matern32", "Matern52", "RBF"])
    def test_fused_value_and_grad_match_autodiff(self, kernel):
        from gpsat_tpu.ops.fused_lml import masked_gpr_lml_fused

        rng2 = np.random.default_rng(9)
        N, D, pad = 40, 2, 9
        X = np.concatenate([rng2.uniform(0, 5, size=(N, D)), np.zeros((pad, D))])
        y = np.concatenate([rng2.normal(size=N), np.zeros(pad)])
        mask = np.concatenate([np.ones(N), np.zeros(pad)])

        def f_fused(ls, kv, lv):
            return masked_gpr_lml_fused(
                kernel, jnp.asarray(X), jnp.asarray(y), jnp.asarray(mask), ls, kv, lv, jnp.asarray(0.0)
            )

        def f_ref(ls, kv, lv):
            return LA.masked_gpr_lml(
                jnp.asarray(X), jnp.asarray(y), jnp.asarray(mask), ls, kv, lv, kernel=kernel
            )

        args = (jnp.asarray([0.9, 1.7]), jnp.asarray(1.3), jnp.asarray(0.05))
        v1 = f_fused(*args)
        v2 = f_ref(*args)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
        g1 = jax.grad(f_fused, argnums=(0, 1, 2))(*args)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10)


def test_tri_inv_blocked_non_multiple_sizes():
    """Identity-padding keeps non-block-multiple sizes (e.g. the
    reference's M=500 inducing set) on the blocked path, exactly."""
    import numpy as np
    import jax.numpy as jnp

    from gpsat_tpu.ops import linalg as LA

    rng = np.random.default_rng(0)
    for n in [500, 65, 130, 127]:
        A = rng.normal(size=(n, n))
        Lnp = np.linalg.cholesky(A @ A.T + n * np.eye(n))
        W = np.asarray(LA.tri_inv_blocked(jnp.asarray(Lnp), T=64))
        np.testing.assert_allclose(W @ Lnp, np.eye(n), atol=1e-8)
