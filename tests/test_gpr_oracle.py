"""Oracle test: GPRModel vs sklearn GaussianProcessRegressor.

Replicates the reference's model-correctness tier
(ref: tests/test_localexperts.py:22-49,204-227): draw a GP sample from a
Matern-3/2, fit the sklearn GPR as oracle, then require the TPU-native exact
GPR to reproduce lengthscale, log marginal likelihood and the predictive
mean/variance at a held-out point to 1e-6.
"""

import numpy as np
import pandas as pd
import pytest
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import Matern

from gpsat_tpu.models import get_model
from gpsat_tpu.models.gpr import GPRModel


@pytest.fixture(scope="module")
def oracle():
    np.random.seed(23435)
    kernel = Matern(length_scale=0.8, nu=3 / 2)
    gp = GaussianProcessRegressor(kernel)
    x = np.linspace(0, 10, 100)[:, None]
    f = gp.sample_y(x, random_state=0)

    N = 50
    eps = 1e-2
    indices = np.arange(100)
    np.random.shuffle(indices)
    x_train = x[indices[:N]]
    y_train = f[indices[:N]] + eps * np.random.randn(N, 1)
    df = pd.DataFrame({"x": x_train[:, 0], "y": y_train[:, 0]})

    gp.alpha = eps**2
    gp.fit(x_train, y_train)
    test_index = np.random.randint(0, 99)
    x_test = x[[test_index]]
    pred_mean, pred_std = gp.predict(x_test, return_std=True)
    return dict(
        df=df,
        eps=eps,
        ls=gp.kernel_.length_scale,
        ml=gp.log_marginal_likelihood(),
        x_test=x_test,
        pred_mean=pred_mean,
        pred_std=pred_std,
    )


class TestGPROracle:
    def test_gpr_matches_sklearn(self, oracle, tol=1e-6):
        model = GPRModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None)
        model.set_parameters(likelihood_variance=oracle["eps"] ** 2)
        model.set_parameter_constraints({"lengthscales": {"low": 1e-10, "high": 5.0}})

        result = model.optimise_parameters(
            fixed_params=["likelihood_variance", "kernel_variance"]
        )
        out = model.predict(coords=oracle["x_test"])
        params = model.get_parameters()
        objfunc = -model.get_objective_function_value()

        assert result
        assert np.abs(params["lengthscales"][0] - oracle["ls"]) < tol
        assert np.abs(objfunc - oracle["ml"]) < tol
        assert np.abs(out["f*"] - oracle["pred_mean"]) < tol
        assert np.abs(out["f*_var"] - oracle["pred_std"] ** 2) < tol

    def test_registry_aliases(self):
        assert get_model("GPflowGPRModel") is GPRModel
        assert get_model("GPRModel") is GPRModel

    def test_full_cov(self, oracle):
        model = GPRModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None)
        model.set_parameters(likelihood_variance=oracle["eps"] ** 2)
        coords = np.linspace(0, 10, 7)[:, None]
        out = model.predict(coords=coords, full_cov=True)
        np.testing.assert_allclose(np.diag(out["f*_cov"]), out["f*_var"], rtol=1e-8)
        np.testing.assert_allclose(
            np.diag(out["y_cov"]), out["y_var"], rtol=1e-8
        )

    def test_obs_mean_local(self, oracle):
        # 'local' de-meaning subtracts tile mean and reports it as f_bar
        model = GPRModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean="local")
        out = model.predict(coords=oracle["x_test"])
        expected = oracle["df"]["y"].mean()
        np.testing.assert_allclose(out["f_bar"], expected, rtol=1e-12)


class TestConstantMean:
    """mean_function='Constant' (ref: gpflow_models.py:143-155): trainable
    offset through both the host model and the batched engine core."""

    def test_host_recovers_offset_and_prior_mean(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(-2, 2, (80, 2))
        y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 5.0 + 0.05 * rng.normal(size=80)
        m = GPRModel(coords=X, obs=y, mean_function="Constant", noise_variance=0.0025)
        assert "mean_c" in m.param_names
        assert m.optimise_parameters(max_iter=500)
        assert abs(m.get_mean_c() - 5.0) < 0.5
        # far from the data the posterior returns the prior (constant) mean
        far = float(m.predict(np.array([[50.0, 50.0]]), apply_scale=False)["f*"][0])
        assert abs(far - m.get_mean_c()) < 1e-6
        near = float(m.predict(np.zeros((1, 2)), apply_scale=False)["f*"][0])
        assert abs(near - 5.0) < 0.05

    def test_unsupported_mean_function_raises(self):
        import pytest

        # Linear is supported as of r3 (tests/test_mean_functions.py);
        # anything outside the implemented set still fails loudly
        with pytest.raises(NotImplementedError, match="mean_function"):
            GPRModel(coords=np.zeros((5, 2)), obs=np.zeros(5), mean_function="Polynomial")

    def test_batched_core_matches_host(self):
        from gpsat_tpu.models.functional import make_gpr_core
        from gpsat_tpu.parallel.batching import TileBatch
        from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

        rng = np.random.default_rng(1)
        B, N, P = 2, 64, 4
        X = rng.uniform(-2, 2, (B, N, 2))
        y = np.sin(X[..., 0]) + 3.0 + 0.05 * rng.normal(size=(B, N))
        batch = TileBatch(
            X=X, y=y, mask=np.ones((B, N)),
            Xnew=rng.uniform(-1, 1, (B, P, 2)),
            pred_mask=np.ones((B, P)),
            obs_mean=np.zeros(B),
            expert_index=np.arange(B),
            num_obs=np.full(B, N),
        )
        core = make_gpr_core(mean_function="Constant")
        runner = make_batched_runner(core, max_iter=500)
        res = run_tile_batch(batch, {"likelihood_variance": 0.0025}, runner, core)
        assert res["converged"].all()
        np.testing.assert_allclose(res["mean_c"], 3.0, atol=0.5)
        # engine prediction == host-model prediction, expert for expert
        for i in range(B):
            hm = GPRModel(coords=X[i], obs=y[i], mean_function="Constant", noise_variance=1.0)
            hm.optimise_parameters(max_iter=500)
            hp = hm.predict(batch.Xnew[i], apply_scale=False)
            np.testing.assert_allclose(res["f_mean"][i], np.asarray(hp["f*"]).ravel(), atol=1e-5)
