"""Multi-output GPR tests: with H = I and one latent, it must reduce
exactly to single-output exact GPR; H mixing recovers latent components."""

import numpy as np
import pytest

from gpsat_tpu.models.gpr import GPRModel
from gpsat_tpu.models.multioutput import MultioutputGPRModel


class TestMultioutputGPR:
    def test_reduces_to_gpr(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(0, 5, size=(40, 1))
        y = np.sin(X[:, 0]) + 0.05 * rng.normal(size=40)

        mo = MultioutputGPRModel(coords=X, obs=y[:, None], H=np.eye(1), likelihood_variance=0.01)
        gpr = GPRModel(coords=X, obs=y, verbose=False)
        gpr.set_parameters(likelihood_variance=0.01)

        np.testing.assert_allclose(
            mo.get_objective_function_value(), gpr.get_objective_function_value(), rtol=1e-10
        )
        Xs = np.linspace(0, 5, 7)[:, None]
        pm = mo.predict(Xs)
        pg = gpr.predict(Xs, apply_scale=False)
        np.testing.assert_allclose(pm["f*"][:, 0], pg["f*"], rtol=1e-8)
        np.testing.assert_allclose(pm["f*_var"][:, 0], pg["f*_var"], rtol=1e-8)

    def test_linear_mixing_recovers_latents(self):
        # two latents observed through two linear combinations
        rng = np.random.default_rng(1)
        n = 80
        X = np.sort(rng.uniform(0, 10, n))[:, None]
        f1 = np.sin(X[:, 0])
        f2 = np.cos(X[:, 0] / 2.0)
        H = np.array([[1.0, 0.5], [0.2, 1.0]])
        F = np.stack([f1, f2], axis=1)
        Y = F @ H.T + 0.02 * rng.normal(size=(n, 2))

        mo = MultioutputGPRModel(coords=X, obs=Y, H=H, likelihood_variance=0.02**2)
        ok = mo.optimise_parameters(max_iter=300)
        assert ok
        pred = mo.predict(X)
        # latent recovery to a few percent
        rmse1 = np.sqrt(np.mean((pred["f*"][:, 0] - f1) ** 2))
        rmse2 = np.sqrt(np.mean((pred["f*"][:, 1] - f2) ** 2))
        assert rmse1 < 0.05 and rmse2 < 0.05
        assert (pred["f*_var"] > 0).all()


class TestMultioutputSVGP:
    def test_recovers_latents(self):
        from gpsat_tpu.models.multioutput import MultioutputSVGPModel

        rng = np.random.default_rng(2)
        n = 100
        X = np.sort(rng.uniform(0, 10, n))[:, None]
        f1 = np.sin(X[:, 0])
        f2 = np.cos(X[:, 0] / 2.0)
        H = np.array([[1.0, 0.5], [0.2, 1.0]])
        Y = np.stack([f1, f2], axis=1) @ H.T + 0.05 * rng.normal(size=(n, 2))

        mo = MultioutputSVGPModel(coords=X, obs=Y, H=H, num_inducing_points=40, likelihood_variance=0.05)
        e0 = mo.get_objective_function_value()
        ok = mo.optimise_parameters(max_iter=800, learning_rate=0.03)
        assert ok
        e1 = mo.get_objective_function_value()
        assert e1 > e0, "training must improve the ELBO"
        pred = mo.predict(X)
        rmse1 = np.sqrt(np.mean((pred["f*"][:, 0] - f1) ** 2))
        rmse2 = np.sqrt(np.mean((pred["f*"][:, 1] - f2) ** 2))
        assert rmse1 < 0.15 and rmse2 < 0.15
        assert (pred["f*_var"] > 0).all()
