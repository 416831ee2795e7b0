"""SGPR oracle tests (ref: tests/test_localexperts.py:229-251).

With M = N inducing points the Titsias bound is tight, so SGPR must
reproduce the sklearn exact-GPR oracle to 1e-4.
"""

import numpy as np
import pandas as pd
import pytest
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import Matern

from gpsat_tpu.models import get_model
from gpsat_tpu.models.sgpr import SGPRModel, make_sgpr_core, pad_inducing_points


@pytest.fixture(scope="module")
def oracle():
    np.random.seed(23435)
    kernel = Matern(length_scale=0.8, nu=3 / 2)
    gp = GaussianProcessRegressor(kernel)
    x = np.linspace(0, 10, 100)[:, None]
    f = gp.sample_y(x, random_state=0)
    N, eps = 50, 1e-2
    indices = np.arange(100)
    np.random.shuffle(indices)
    x_train = x[indices[:N]]
    y_train = f[indices[:N]] + eps * np.random.randn(N, 1)
    df = pd.DataFrame({"x": x_train[:, 0], "y": y_train[:, 0]})
    gp.alpha = eps**2
    gp.fit(x_train, y_train)
    x_test = x[[np.random.randint(0, 99)]]
    pred_mean, pred_std = gp.predict(x_test, return_std=True)
    return dict(df=df, eps=eps, ls=gp.kernel_.length_scale, x_test=x_test, pred_mean=pred_mean, pred_std=pred_std)


class TestSGPR:
    def test_sgpr_matches_oracle(self, oracle, tol=1e-4):
        model = SGPRModel(
            data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=50
        )
        model.set_parameters(likelihood_variance=oracle["eps"] ** 2)
        model.set_parameter_constraints({"lengthscales": {"low": 1e-10, "high": 5.0}})
        result = model.optimise_parameters(fixed_params=["likelihood_variance", "kernel_variance"])
        out = model.predict(coords=oracle["x_test"])
        params = model.get_parameters()
        assert result
        assert np.abs(params["lengthscales"][0] - oracle["ls"]) < tol
        assert np.abs(out["f*"] - oracle["pred_mean"]) < tol
        assert np.abs(out["f*_var"] - oracle["pred_std"] ** 2) < tol

    def test_elbo_below_lml(self, oracle):
        # the collapsed bound with M < N must lower-bound the exact LML
        from gpsat_tpu.models.gpr import GPRModel

        gpr = GPRModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None)
        gpr.set_parameters(likelihood_variance=oracle["eps"] ** 2, lengthscales=0.8)
        lml = -gpr.get_objective_function_value()

        np.random.seed(0)
        sgpr = SGPRModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=15)
        sgpr.set_parameters(likelihood_variance=oracle["eps"] ** 2, lengthscales=np.array([0.8]))
        elbo_val = sgpr.get_objective_function_value()
        assert elbo_val < lml
        assert np.isfinite(elbo_val)
        # with M = N the bound is near-tight (residual gap comes from the
        # 1e-6 Kuu jitter interacting with the tiny 1e-4 noise, same as
        # gpflow's default_jitter)
        np.random.seed(0)
        sgpr_full = SGPRModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=50)
        sgpr_full.set_parameters(likelihood_variance=oracle["eps"] ** 2, lengthscales=np.array([0.8]))
        full_elbo = sgpr_full.get_objective_function_value()
        assert lml - 0.5 < full_elbo < lml

    def test_registry(self):
        assert get_model("GPflowSGPRModel") is SGPRModel

    def test_masked_padding_invariance(self, oracle):
        # core objective with padded obs rows == unpadded
        import jax.numpy as jnp

        from gpsat_tpu.models.sgpr import elbo

        df = oracle["df"]
        X = df[["x"]].values
        y = df["y"].values
        Z = np.array(X[:20], copy=True)
        cparams = {
            "lengthscales": jnp.asarray([0.8]),
            "kernel_variance": jnp.asarray(1.0),
            "likelihood_variance": jnp.asarray(1e-4),
            "inducing_points": jnp.asarray(Z),
        }
        data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.ones(len(X))}
        e1 = elbo(cparams, data, kernel="Matern32")
        Xp = np.concatenate([X, np.zeros((7, 1))])
        yp = np.concatenate([y, np.ones(7)])
        mp = np.concatenate([np.ones(len(X)), np.zeros(7)])
        data_p = {"X": jnp.asarray(Xp), "y": jnp.asarray(yp), "mask": jnp.asarray(mp)}
        e2 = elbo(cparams, data_p, kernel="Matern32")
        np.testing.assert_allclose(float(e2), float(e1), rtol=1e-10)

    def test_far_inducing_padding_noop(self, oracle):
        # padding the inducing set with far-away points leaves the bound
        # and predictions essentially unchanged
        import jax.numpy as jnp

        from gpsat_tpu.models.sgpr import elbo, predict

        df = oracle["df"]
        X = df[["x"]].values
        y = df["y"].values
        Z = np.array(X[:20], copy=True)
        Zp = pad_inducing_points(Z, 26, data_span=10.0)
        mk = lambda Zi: {
            "lengthscales": jnp.asarray([0.8]),
            "kernel_variance": jnp.asarray(1.0),
            "likelihood_variance": jnp.asarray(1e-4),
            "inducing_points": jnp.asarray(Zi),
        }
        data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.ones(len(X))}
        e1 = elbo(mk(Z), data, kernel="Matern32")
        e2 = elbo(mk(Zp), data, kernel="Matern32")
        np.testing.assert_allclose(float(e2), float(e1), rtol=1e-8)
        Xs = jnp.asarray(np.linspace(0, 10, 7)[:, None])
        p1 = predict(mk(Z), data, Xs, kernel="Matern32")
        p2 = predict(mk(Zp), data, Xs, kernel="Matern32")
        np.testing.assert_allclose(np.asarray(p1["f_mean"]), np.asarray(p2["f_mean"]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(p1["f_var"]), np.asarray(p2["f_var"]), atol=1e-8)


def test_f32_inducing_slot_padding_stays_finite():
    """M > tile size in float32: the far-point inducing pads must not
    corrupt the Kuu Cholesky (regression: 1e6*span pads lost the diagonal
    to |z|^2*eps roundoff and NaN'd in f32)."""
    import numpy as np

    from gpsat_tpu.models.sgpr import make_sgpr_core
    from gpsat_tpu.parallel.batching import TileBatch
    from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

    rng = np.random.default_rng(0)
    B, N, P = 2, 48, 4
    X = rng.uniform(-6, 6, (B, N, 2)).astype(np.float32)
    batch = TileBatch(
        X=X,
        y=(np.sin(X[..., 0]) * np.cos(X[..., 1])).astype(np.float32),
        mask=np.ones((B, N), np.float32),
        Xnew=rng.uniform(-4, 4, (B, P, 2)).astype(np.float32),
        pred_mask=np.ones((B, P), np.float32),
        obs_mean=np.zeros(B, np.float32),
        expert_index=np.arange(B),
        num_obs=np.full(B, N),
    )
    core = make_sgpr_core(jitter=1e-5, num_inducing_points=96)  # M = 2N
    runner = make_batched_runner(core, fixed_params=tuple(core.default_fixed_params), max_iter=60)
    res = run_tile_batch(batch, {"smart_init": True}, runner, core)
    assert np.isfinite(res["objective"]).all()
    assert np.isfinite(res["f_mean"]).all()
    assert res["converged"].all()


def test_constant_mean_function():
    """SGPR mean_function='Constant' (ref gpflow_models.py:706): trainable
    offset through host model and batched core."""
    import numpy as np

    from gpsat_tpu.models.sgpr import SGPRModel

    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (80, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 5.0 + 0.05 * rng.normal(size=80)
    m = SGPRModel(coords=X, obs=y, num_inducing_points=40,
                  mean_function="Constant", noise_variance=0.0025)
    assert "mean_c" in m.param_names
    assert m.optimise_parameters(max_iter=500)
    assert abs(m.get_mean_c() - 5.0) < 0.5
    far = float(m.predict(np.array([[50.0, 50.0]]), apply_scale=False)["f*"][0])
    assert abs(far - m.get_mean_c()) < 1e-5


def test_chunked_matches_unchunked():
    """Large-N path: the chunk-accumulated [M, N] factors reproduce the
    materialized bound, gradients, and predictions to f64 roundoff —
    including a non-chunk-multiple N (internal padding) and masked rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpsat_tpu.models import sgpr

    rng = np.random.default_rng(0)
    N, M, D = 700, 32, 2
    X = rng.uniform(0, 5, (N, D))
    y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=N)
    mask = np.ones(N)
    mask[-37:] = 0.0
    Z = X[rng.choice(N, M, replace=False)]
    data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.asarray(mask)}
    cp = {
        "lengthscales": jnp.asarray([1.0, 1.3]),
        "kernel_variance": jnp.asarray(0.8),
        "likelihood_variance": jnp.asarray(0.05),
        "inducing_points": jnp.asarray(Z),
    }
    e0 = float(sgpr.elbo(cp, data, kernel="Matern32"))
    e1 = float(sgpr.elbo(cp, data, kernel="Matern32", chunk_size=128))
    np.testing.assert_allclose(e1, e0, rtol=1e-12)

    g0 = jax.grad(lambda c: sgpr.elbo(c, data, kernel="Matern32"))(cp)
    g1 = jax.grad(lambda c: sgpr.elbo(c, data, kernel="Matern32", chunk_size=128))(cp)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-8, atol=1e-9)

    Xn = jnp.asarray(rng.uniform(0, 5, (9, D)))
    p0 = sgpr.predict(cp, data, Xn, kernel="Matern32")
    p1 = sgpr.predict(cp, data, Xn, kernel="Matern32", chunk_size=128)
    for k in p0:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]), rtol=1e-10)


def test_chunk_remat_knob_value_and_grad_identical():
    """GPSAT_CHUNK_REMAT=0 (stash chunk residuals instead of recomputing
    them in the backward pass) is a pure memory/FLOPs trade: bound and
    gradients must be bit-comparable to the remat default."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpsat_tpu.models import sgpr

    rng = np.random.default_rng(1)
    N, M, D = 512, 16, 2
    X = rng.uniform(0, 5, (N, D))
    y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=N)
    data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.ones(N)}
    cp = {
        "lengthscales": jnp.asarray([1.0, 1.3]),
        "kernel_variance": jnp.asarray(0.8),
        "likelihood_variance": jnp.asarray(0.05),
        "inducing_points": jnp.asarray(X[rng.choice(N, M, replace=False)]),
    }

    def value_and_grad():
        f = lambda c: sgpr.elbo(c, data, kernel="Matern32", chunk_size=128)
        return float(f(cp)), jax.grad(f)(cp)

    old = os.environ.pop("GPSAT_CHUNK_REMAT", None)
    try:
        e_remat, g_remat = value_and_grad()
        os.environ["GPSAT_CHUNK_REMAT"] = "0"
        e_stash, g_stash = value_and_grad()
    finally:
        os.environ.pop("GPSAT_CHUNK_REMAT", None)
        if old is not None:
            os.environ["GPSAT_CHUNK_REMAT"] = old

    np.testing.assert_allclose(e_stash, e_remat, rtol=1e-13)
    for k in g_remat:
        np.testing.assert_allclose(
            np.asarray(g_stash[k]), np.asarray(g_remat[k]), rtol=1e-10, atol=1e-12
        )


def test_large_n_tile_fits_and_fits_well():
    """A single N=16384 tile runs through the host SGPR model with the
    auto-chunked bound (the large-N regime the reference claims via
    gpflow_models.py:672-681) and recovers the noise level."""
    import numpy as np

    from gpsat_tpu.models.sgpr import SGPRModel

    rng = np.random.default_rng(1)
    N = 16384
    X = rng.uniform(0, 5, (N, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.1 * rng.normal(size=N)
    m = SGPRModel(coords=X, obs=y, num_inducing_points=64, noise_variance=0.05)
    assert m.optimise_parameters(max_iter=300)
    nv = float(np.ravel(m.get_likelihood_variance())[0])
    assert 0.005 < nv < 0.02, f"noise variance {nv} should approach 0.01"
    pred = m.predict(np.array([[2.5, 2.5]]), apply_scale=False)
    assert np.isfinite(pred["f*"]).all() and float(pred["f*_var"][0]) > 0


def test_fast_inverse_path_matches_solve_path():
    """The f32-production W = L^-1 matmul path (forced on in f64) matches
    the triangular-solve path to roundoff, chunked and unchunked."""
    import numpy as np
    import jax.numpy as jnp

    from gpsat_tpu.models.sgpr import elbo, predict
    from gpsat_tpu.ops import linalg as LA

    rng = np.random.default_rng(0)
    N, M, D = 300, 100, 2
    X = rng.uniform(-4, 4, (N, D))
    y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=N)
    mask = (np.arange(N) < 280).astype(float)
    Z = X[rng.choice(N, M, replace=False)]
    cp = {
        "lengthscales": jnp.asarray([1.0, 1.2]),
        "kernel_variance": jnp.asarray(0.8),
        "likelihood_variance": jnp.asarray(0.05),
        "inducing_points": jnp.asarray(Z),
    }
    data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.asarray(mask)}
    Xnew = jnp.asarray(rng.uniform(-3, 3, (7, D)))
    try:
        LA.set_fast_inverse(True)
        e_fast = float(elbo(cp, data, kernel="Matern32"))
        e_fast_c = float(elbo(cp, data, kernel="Matern32", chunk_size=128))
        p_fast = predict(cp, data, Xnew, kernel="Matern32")
    finally:
        LA.set_fast_inverse(None)
    e_ref = float(elbo(cp, data, kernel="Matern32"))
    p_ref = predict(cp, data, Xnew, kernel="Matern32")
    np.testing.assert_allclose(e_fast, e_ref, rtol=1e-9)
    np.testing.assert_allclose(e_fast_c, e_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(p_fast["f_mean"]), np.asarray(p_ref["f_mean"]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_fast["f_var"]), np.asarray(p_ref["f_var"]), atol=1e-9)
