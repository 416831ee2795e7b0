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


class TestForwardModelLikelihoods:
    """Compat layer: ForwardModel / likelihood classes + conditionals
    (ref: multioutput/utils.py, multioutput/likelihoods.py)."""

    def test_linear_likelihood_closed_forms(self):
        import numpy as np
        from gpsat_tpu.models.multioutput import LinearModelLikelihood

        lik = LinearModelLikelihood(input_dim=2, variance=0.1,
                                    forward_model=np.array([[0.5, 0.5]]))
        f = np.array([[1.0, 1.0]])
        fmu = np.array([[1.0, 1.0]])
        fvar = np.eye(2)[None]
        X = np.array([[0.5, 0.5]])
        y = np.array([[1.0]])

        np.testing.assert_allclose(lik.conditional_mean(X, f), [[1.0]], atol=1e-12)
        np.testing.assert_allclose(lik.conditional_variance(X, f), [[0.1]], atol=1e-12)
        mu, var = lik.predict_mean_and_var(X, fmu, fvar)
        np.testing.assert_allclose(mu, [[1.0]], atol=1e-12)
        np.testing.assert_allclose(var, [[[0.6]]], atol=1e-12)
        # log N(1 | 1, 0.6)
        np.testing.assert_allclose(
            lik.predict_log_density(X, fmu, fvar, y),
            [-0.5 * np.log(2 * np.pi * 0.6)], atol=1e-10)
        # E_q log p = log N(1|1, 0.1) - 0.5 * tr(R^-1 H Fcov H^T)
        np.testing.assert_allclose(
            lik.variational_expectations(X, fmu, fvar, y),
            [-0.5 * np.log(2 * np.pi * 0.1) - 0.5 * (0.5 / 0.1)], atol=1e-10)

    def test_nonlinear_mc_matches_linear_closed_form(self):
        import numpy as np
        from gpsat_tpu.models.multioutput import (
            LinearForwardModel,
            LinearModelLikelihood,
            NonlinearModelLikelihood,
        )

        H = np.array([[0.7, -0.3], [0.1, 0.9]])
        fwd = LinearForwardModel(2, 2, 2, H)
        lin = LinearModelLikelihood(input_dim=2, variance=0.2, forward_model=H)
        mc = NonlinearModelLikelihood(fwd, variance=0.2, num_samples=20000, seed=3)

        rng = np.random.default_rng(0)
        fmu = rng.normal(size=(4, 2))
        A = rng.normal(size=(4, 2, 2)) * 0.3
        fvar = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(2)
        X = rng.normal(size=(4, 2))
        y = rng.normal(size=(4, 2))
        got = np.asarray(mc.variational_expectations(X, fmu, fvar, y))
        want = np.asarray(lin.variational_expectations(X, fmu, fvar, y))
        np.testing.assert_allclose(got, want, atol=0.1)

    def test_multioutput_conditional_reduces_to_scalar_gp(self):
        """L=P=1, H=[[1]]: multioutput_conditional must equal the standard
        GP posterior computed directly in numpy."""
        import numpy as np
        from gpsat_tpu.models.multioutput import multioutput_conditional

        rng = np.random.default_rng(1)
        Xm = rng.uniform(0, 5, (7, 1))
        Xn = rng.uniform(0, 5, (4, 1))

        def k(a, b):
            d = np.abs(a[:, None, 0] - b[None, :, 0])
            return (1 + np.sqrt(3) * d) * np.exp(-np.sqrt(3) * d)

        Kmm = k(Xm, Xm)
        Kmn = k(Xm, Xn)
        Knn = k(Xn, Xn)
        y = rng.normal(size=(7, 1))
        sn2 = 0.05

        mean, var = multioutput_conditional(
            Kmn[:, None, :, None], Kmm[:, None, :, None], Knn[:, None, :, None],
            y, np.array([[1.0]]), np.array([[sn2]]), full_cov=True)

        Ky = Kmm + sn2 * np.eye(7)
        want_mean = Kmn.T @ np.linalg.solve(Ky, y[:, 0])
        want_var = Knn - Kmn.T @ np.linalg.solve(Ky, Kmn)
        np.testing.assert_allclose(np.asarray(mean)[:, 0], want_mean, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var)[:, 0, :, 0], want_var, atol=1e-5)
        # diag-only path agrees with the full covariance diagonal
        _, var_d = multioutput_conditional(
            Kmn[:, None, :, None], Kmm[:, None, :, None],
            np.diagonal(Knn)[:, None, None],
            y, np.array([[1.0]]), np.array([[sn2]]), full_cov=False)
        np.testing.assert_allclose(np.asarray(var_d)[:, 0, 0], np.diagonal(want_var), atol=1e-5)

    def test_add_likelihood_noise_cov(self):
        import numpy as np
        from gpsat_tpu.models.multioutput import add_likelihood_noise_cov

        K = np.zeros((3, 3, 2, 2))
        R = np.array([[0.5, 0.1], [0.1, 0.4]])
        out = np.asarray(add_likelihood_noise_cov(K, R))
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(out[i, j], R if i == j else 0 * R)


def test_reference_import_paths():
    """Migration surface: reference module paths + class names resolve."""
    from gpsat_tpu.models.base_model import BaseGPRModel  # noqa: F401
    from gpsat_tpu.models.gpflow_models import (  # noqa: F401
        GPflowGPRModel, GPflowSGPRModel, GPflowSVGPModel)
    from gpsat_tpu.models.vff_model import GPflowVFFModel  # noqa: F401
    from gpsat_tpu.models.asvgp_model import GPflowASVGPModel  # noqa: F401
    from gpsat_tpu.models.sklearn_models import sklearnGPRModel  # noqa: F401
    from gpsat_tpu.models.gpytorch_models import (  # noqa: F401
        GPyTorchGPRModel, GPyTorchKISSGPModel)
    from gpsat_tpu.models.pure_python_gpr import (  # noqa: F401
        GPR, Nystroem, PurePythonGPR, SGPkernel, SMLII_mod)
    from gpsat_tpu.models import GPflowGPRModel as A  # noqa: F401
    from gpsat_tpu.models.multioutput import (  # noqa: F401
        MultioutputGPR, MultioutputSVGP)
    import gpsat_tpu.models as M
    from gpsat_tpu.models.gpr import GPRModel
    assert M.GPflowGPRModel is GPRModel
