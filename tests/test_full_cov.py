"""full_cov predictions across the zoo (ref: the shared GPflow-model
predict honors full_cov and returns f*_cov + y_cov,
GPSat/models/gpflow_models.py:187-260). Checks: diag(f*_cov) == f*_var,
symmetry, y_cov = f*_cov + lik_var*I, and SGPR(M=N, Z=X) reproducing the
exact GPR covariance."""

import numpy as np
import pytest


def _fit_data():
    rng = np.random.default_rng(11)
    X = rng.uniform(-3, 3, (80, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.05 * rng.normal(size=80)
    Xnew = rng.uniform(-2, 2, (6, 2))
    return X, y, Xnew


@pytest.mark.parametrize("name,kwargs", [
    ("GPflowGPRModel", {}),
    ("GPflowSGPRModel", {"num_inducing_points": 24}),
    ("GPflowSVGPModel", {"num_inducing_points": 24}),
    ("GPflowVFFModel", {"num_inducing_features": 8}),
    ("GPflowASVGPModel", {"num_inducing_features": 12}),
    ("sklearnGPRModel", {}),
    ("GPyTorchGPRModel", {}),
])
def test_full_cov_schema_and_consistency(name, kwargs):
    from gpsat_tpu.models import get_model

    X, y, Xnew = _fit_data()
    m = get_model(name)(coords=X, obs=y, **kwargs)
    if name == "GPflowSVGPModel":
        m.optimise_parameters(solver="collapsed", max_iter=60)
    elif name == "sklearnGPRModel":
        m.optimise_parameters()
    else:
        m.optimise_parameters(max_iter=60)
    out = m.predict(Xnew, full_cov=True, apply_scale=False)
    assert "f*_cov" in out, sorted(out)
    C = out["f*_cov"]
    P = len(Xnew)
    assert C.shape == (P, P)
    np.testing.assert_allclose(np.diag(C), out["f*_var"], rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(C, C.T, atol=1e-9)
    if name != "sklearnGPRModel":
        # the reference's sklearn model returns no y_cov/y_var under
        # full_cov (GPSat/models/sklearn_models.py:163-176); the gpflow
        # models do (gpflow_models.py:244-260)
        assert "y_cov" in out, sorted(out)
        lik = float(np.atleast_1d(m.get_likelihood_variance())[0])
        np.testing.assert_allclose(
            np.diag(out["y_cov"]), np.diag(C) + lik, rtol=2e-5, atol=1e-7
        )
    # without the flag, the keys stay absent (reference schema)
    out2 = m.predict(Xnew, apply_scale=False)
    assert "f*_cov" not in out2 and "y_cov" not in out2


def test_sgpr_full_cov_matches_gpr_at_m_equals_n():
    from gpsat_tpu.models import get_model

    X, y, Xnew = _fit_data()
    gpr = get_model("GPflowGPRModel")(coords=X, obs=y)
    gpr.optimise_parameters(max_iter=100)
    p = gpr.get_parameters()

    sgpr = get_model("GPflowSGPRModel")(coords=X, obs=y, num_inducing_points=len(X))
    sgpr.set_inducing_points(X)
    sgpr.set_parameters(
        lengthscales=p["lengthscales"],
        kernel_variance=p["kernel_variance"],
        likelihood_variance=p["likelihood_variance"],
    )
    cg = gpr.predict(Xnew, full_cov=True, apply_scale=False)["f*_cov"]
    cs = sgpr.predict(Xnew, full_cov=True, apply_scale=False)["f*_cov"]
    np.testing.assert_allclose(cs, cg, atol=5e-5)
