"""PureNumpyGPR (in-repo oracle) and TorchGPRModel cross-checks.

The reference cross-checks its PurePythonGPR against GPflow
(ref: models/pure_python_gpr.py:556-672); here the numpy oracle
cross-checks the JAX GPR — two fully independent code paths."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.models import get_model
from gpsat_tpu.models.gpr import GPRModel
from gpsat_tpu.models.pure_numpy_gpr import PureNumpyGPR, neg_lml
from gpsat_tpu.models.torch_gpr import TorchGPRModel


@pytest.fixture(scope="module")
def data_1d():
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(0, 10, 60))[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=60)
    return x, y


class TestPureNumpyGPR:
    def test_lml_matches_jax_gpr(self, data_1d):
        x, y = data_1d
        pp = PureNumpyGPR(x, y, length_scales=1.3, kernel_var=0.9, likeli_var=0.02)
        jx = GPRModel(coords=x, obs=y, verbose=False)
        jx.set_parameters(lengthscales=np.array([1.3]), kernel_variance=0.9, likelihood_variance=0.02)
        np.testing.assert_allclose(
            pp.get_objective_function_value(), jx.get_objective_function_value(), rtol=1e-9
        )

    def test_analytic_gradients_match_finite_diff(self, data_1d):
        x, y = data_1d
        h = np.array([1.3, 0.9, 0.02])
        _, g = neg_lml(h, x, y, grad=True)
        for i in range(3):
            e = np.zeros(3)
            e[i] = 1e-6
            fd = (neg_lml(h + e, x, y, grad=False) - neg_lml(h - e, x, y, grad=False)) / 2e-6
            np.testing.assert_allclose(g[i], fd, rtol=1e-4)

    def test_optimise_and_predict_match_jax(self, data_1d):
        x, y = data_1d
        pp = PureNumpyGPR(x, y)
        ok = pp.optimise_parameters()
        assert ok
        jx = GPRModel(coords=x, obs=y, verbose=False)
        jx.optimise_parameters()
        np.testing.assert_allclose(pp.get_lengthscales(), jx.get_lengthscales(), rtol=1e-3)
        xs = np.linspace(0, 10, 9)[:, None]
        p1 = pp.predict(xs)
        p2 = jx.predict(xs, apply_scale=False)
        np.testing.assert_allclose(p1["f*"], p2["f*"], atol=1e-4)
        np.testing.assert_allclose(p1["f*_var"], p2["f*_var"], atol=1e-4)

    def test_nystroem_approx_reasonable(self, data_1d):
        x, y = data_1d
        pp = PureNumpyGPR(x, y, length_scales=1.3, kernel_var=0.9, likeli_var=0.02)
        exact = pp.predict(x[:10])
        approx = pp.predict(x[:10], approx=True, M=40)
        np.testing.assert_allclose(approx["f*"], exact["f*"], atol=0.05)

    def test_registry(self):
        assert get_model("PurePythonGPR") is PureNumpyGPR


class TestTorchGPR:
    def test_lml_matches_jax(self, data_1d):
        x, y = data_1d
        tm = TorchGPRModel(coords=x, obs=y, verbose=False)
        tm.set_parameters(lengthscales=1.3, kernel_variance=0.9, likelihood_variance=0.02)
        jx = GPRModel(coords=x, obs=y, verbose=False)
        jx.set_parameters(lengthscales=np.array([1.3]), kernel_variance=0.9, likelihood_variance=0.02)
        # float32 torch vs float64 jax
        np.testing.assert_allclose(
            tm.get_objective_function_value(), jx.get_objective_function_value(), rtol=1e-4
        )

    def test_train_and_predict(self, data_1d):
        x, y = data_1d
        tm = TorchGPRModel(coords=x, obs=y, verbose=False, noise_variance=0.01)
        ok = tm.optimise_parameters(optimiser="adam", n_iter=60, lr=0.1)
        assert ok
        out = tm.predict(np.array([[5.0]]), apply_scale=False)
        assert abs(out["f*"][0] - np.sin(5.0)) < 0.2
        assert out["y_var"][0] > out["f*_var"][0]

    def test_smoothness_param(self, data_1d):
        x, y = data_1d
        tm = TorchGPRModel(coords=x, obs=y, verbose=False, smoothness=2.5)
        assert tm.get_smoothness() == 2.5
        assert "smoothness" in tm.param_names
        assert np.isfinite(tm.get_objective_function_value())

    def test_registry(self):
        assert get_model("GPyTorchGPRModel") is TorchGPRModel


class TestTorchKISSGP:
    """KISS-GP / SKI (ref: GPSat/models/gpytorch_models.py:321-382)."""

    def test_grid_refinement_converges_to_exact(self, data_1d):
        x, y = data_1d
        exact = TorchGPRModel(coords=x, obs=y, verbose=False)
        exact.set_parameters(lengthscales=1.3, kernel_variance=0.9, likelihood_variance=0.02)
        pe = exact.predict(np.array([[2.0], [5.0]]), apply_scale=False)

        kiss_cls = get_model("GPyTorchKISSGPModel")
        errs = []
        for gs in (8, 64):
            km = kiss_cls(coords=x, obs=y, verbose=False, grid_size=gs)
            km.set_parameters(lengthscales=1.3, kernel_variance=0.9, likelihood_variance=0.02)
            pk = km.predict(np.array([[2.0], [5.0]]), apply_scale=False)
            errs.append(np.max(np.abs(pk["f*"] - pe["f*"])))
        assert errs[1] < errs[0]  # finer grid -> closer to exact
        assert errs[1] < 5e-3

    def test_train_and_predict(self, data_1d):
        x, y = data_1d
        km = get_model("GPyTorchKISSGPModel")(coords=x, obs=y, verbose=False, grid_size=24, noise_variance=0.01)
        assert km.optimise_parameters(optimiser="adam", n_iter=60, lr=0.1)
        out = km.predict(np.array([[5.0]]), apply_scale=False)
        assert abs(out["f*"][0] - np.sin(5.0)) < 0.2
        assert out["y_var"][0] > out["f*_var"][0]
