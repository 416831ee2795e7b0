"""SVGP correctness tests.

Key identities used as oracles:
- with Gaussian likelihood and q(v) at its optimum, the SVGP ELBO equals
  the SGPR collapsed bound at the same hyperparameters (Titsias);
- one natural-gradient step with gamma=1 lands exactly on that optimum
  for Gaussian likelihoods (Salimbeni et al. 2018);
- full-batch Adam training recovers the sklearn GPR oracle predictions.
"""

import numpy as np
import pandas as pd
import pytest
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import Matern

from gpsat_tpu.models import get_model
from gpsat_tpu.models.sgpr import SGPRModel
from gpsat_tpu.models.svgp import SVGPModel, variational_expectations


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


class TestSVGP:
    def test_natgrad_step_reaches_sgpr_bound(self, oracle):
        # fix hyperparameters; a single gamma=1 natural-gradient step on the
        # full batch should put the ELBO at the collapsed SGPR bound
        np.random.seed(1)
        svgp = SVGPModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=20)
        svgp.set_parameters(likelihood_variance=0.01, lengthscales=np.array([0.8]))
        Z = svgp.get_inducing_points()

        np.random.seed(2)
        sgpr = SGPRModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=20)
        sgpr.set_parameters(likelihood_variance=0.01, lengthscales=np.array([0.8]))
        sgpr.set_inducing_points(Z)
        sgpr_bound = sgpr.get_objective_function_value()

        svgp.optimise_parameters(
            natural_gradients=True,
            gamma=1.0,
            max_iter=2,
            early_stop=False,
            fixed_params=["lengthscales", "kernel_variance", "likelihood_variance"],
        )
        elbo_after = svgp.get_objective_function_value()
        # jitter placement differs slightly between the two bounds
        np.testing.assert_allclose(elbo_after, sgpr_bound, rtol=1e-4, atol=5e-3)

    def test_adam_training_matches_oracle(self, oracle):
        np.random.seed(3)
        svgp = SVGPModel(
            data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=None
        )
        svgp.set_parameters(likelihood_variance=oracle["eps"] ** 2)
        res = svgp.optimise_parameters(
            natural_gradients=True,
            gamma=1.0,
            learning_rate=0.02,
            max_iter=1500,
            check_every=20,
            persistence=200,
            fixed_params=["likelihood_variance", "kernel_variance"],
        )
        out = svgp.predict(coords=oracle["x_test"])
        assert res is True or res is np.nan or not np.isnan(res)
        assert np.abs(out["f*"] - oracle["pred_mean"]) < 5e-3
        assert np.abs(out["f*_var"] - oracle["pred_std"] ** 2) < 5e-3
        assert np.abs(svgp.get_lengthscales()[0] - oracle["ls"]) < 0.05

    def test_minibatch_elbo_unbiased(self, oracle):
        np.random.seed(4)
        svgp = SVGPModel(
            data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None,
            num_inducing_points=10, minibatch_size=10,
        )
        import jax.numpy as jnp

        from gpsat_tpu.models.svgp import elbo

        data = svgp._data_dict()
        c = svgp._cparams()
        full = float(elbo(c, data, kernel="Matern32"))
        rng = np.random.default_rng(0)
        ests = [
            float(elbo(c, data, kernel="Matern32", batch_idx=jnp.asarray(rng.choice(50, 10, replace=False))))
            for _ in range(400)
        ]
        assert abs(np.mean(ests) - full) < abs(full) * 0.05 + 1.0

    def test_studentt_ve_matches_montecarlo(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        y = jnp.asarray([0.3, -1.2, 2.0])
        mu = jnp.asarray([0.0, -1.0, 1.5])
        var = jnp.asarray([0.5, 0.1, 1.0])
        ve = variational_expectations("StudentT", y, mu, var, {"variance": 0.09, "df": 3.0})
        # monte-carlo check
        from scipy.stats import t as student_t

        f = rng.normal(size=(200_000, 3)) * np.sqrt(np.asarray(var)) + np.asarray(mu)
        mc = student_t.logpdf(np.asarray(y), df=3.0, loc=f, scale=0.3).mean(axis=0)
        np.testing.assert_allclose(np.asarray(ve), mc, atol=5e-3)

    def test_bernoulli_ve_matches_montecarlo(self):
        import jax.numpy as jnp
        from scipy.stats import norm

        rng = np.random.default_rng(1)
        y = jnp.asarray([1.0, 0.0, 1.0])
        mu = jnp.asarray([0.5, -0.3, 2.0])
        var = jnp.asarray([0.4, 0.2, 1.0])
        ve = variational_expectations("Bernoulli", y, mu, var, {})
        f = rng.normal(size=(200_000, 3)) * np.sqrt(np.asarray(var)) + np.asarray(mu)
        ys = np.where(np.asarray(y) > 0, 1.0, -1.0)
        mc = norm.logcdf(ys * f).mean(axis=0)
        np.testing.assert_allclose(np.asarray(ve), mc, atol=5e-3)

    def test_poisson_ve_matches_montecarlo(self):
        import jax.numpy as jnp
        from scipy.stats import poisson

        rng = np.random.default_rng(2)
        y = jnp.asarray([0.0, 2.0, 5.0])
        mu = jnp.asarray([-0.5, 0.3, 1.4])
        var = jnp.asarray([0.3, 0.2, 0.5])
        ve = variational_expectations("Poisson", y, mu, var, {})
        f = rng.normal(size=(400_000, 3)) * np.sqrt(np.asarray(var)) + np.asarray(mu)
        mc = poisson.logpmf(np.asarray(y), np.exp(f)).mean(axis=0)
        np.testing.assert_allclose(np.asarray(ve), mc, atol=5e-3)

    def test_early_stopping_and_registry(self, oracle):
        assert get_model("GPflowSVGPModel") is SVGPModel
        np.random.seed(5)
        svgp = SVGPModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=10)
        res = svgp.optimise_parameters(max_iter=400, check_every=10, persistence=50)
        assert res in (True, False) or np.isnan(res)

    def test_param_roundtrip(self, oracle):
        svgp = SVGPModel(data=oracle["df"], obs_col="y", coords_col="x", obs_mean=None, num_inducing_points=8)
        q_mu = np.arange(8, dtype=float).reshape(-1, 1)
        svgp.set_inducing_mean(q_mu)
        np.testing.assert_array_equal(svgp.get_inducing_mean(), q_mu)
        q_sqrt = np.tril(np.ones((1, 8, 8)))
        svgp.set_inducing_chol(q_sqrt)
        assert svgp.get_inducing_chol().shape == (1, 8, 8)


def test_batched_natgrad_hybrid_optimizer():
    """natural_gradients=True on the batched core: the reference's hybrid
    Adam+NatGrad optimizer (ref: gpflow_models.py:1186-1212). The
    variational pair steps by natural gradient and is excluded from Adam;
    at a fixed iteration budget the ELBO must not be worse than plain
    Adam's."""
    import numpy as np

    from gpsat_tpu.models.svgp import make_svgp_core
    from gpsat_tpu.parallel.batching import TileBatch
    from gpsat_tpu.parallel.engine import make_batched_adam_runner, run_tile_batch

    rng = np.random.default_rng(0)
    B, N, P = 2, 64, 4
    X = rng.uniform(-4, 4, (B, N, 2))
    batch = TileBatch(
        X=X,
        y=np.sin(X[..., 0]) * np.cos(X[..., 1]) + 0.05 * rng.normal(size=(B, N)),
        mask=np.ones((B, N)),
        Xnew=rng.uniform(-3, 3, (B, P, 2)),
        pred_mask=np.ones((B, P)),
        obs_mean=np.zeros(B),
        expert_index=np.arange(B),
        num_obs=np.full(B, N),
    )
    elbos = {}
    for ng in (False, True):
        core = make_svgp_core(num_inducing_points=24, natural_gradients=ng)
        runner = make_batched_adam_runner(
            core, fixed_params=tuple(core.default_fixed_params),
            max_iter=600, learning_rate=1e-2, check_every=10, persistence=600,
        )
        res = run_tile_batch(batch, {"smart_init": True}, runner, core)
        assert res["converged"].all()
        assert np.isfinite(res["f_mean"]).all()
        elbos[ng] = -np.asarray(res["objective"])
    assert (elbos[True] >= elbos[False] - 0.5).all(), (elbos[True], elbos[False])


def test_natgrad_runs_when_all_adam_params_fixed():
    """Fixed hyperparameters + natural gradients (the smoothed-params
    re-run workflow): the variational pair must still be fitted."""
    import numpy as np

    from gpsat_tpu.models.svgp import make_svgp_core
    from gpsat_tpu.parallel.batching import TileBatch
    from gpsat_tpu.parallel.engine import make_batched_adam_runner, run_tile_batch

    rng = np.random.default_rng(0)
    B, N, P = 2, 48, 4
    X = rng.uniform(-3, 3, (B, N, 2))
    batch = TileBatch(
        X=X, y=np.sin(X[..., 0]) + 0.05 * rng.normal(size=(B, N)),
        mask=np.ones((B, N)), Xnew=X[:, :P], pred_mask=np.ones((B, P)),
        obs_mean=np.zeros(B), expert_index=np.arange(B), num_obs=np.full(B, N),
    )
    core = make_svgp_core(num_inducing_points=16, natural_gradients=True, gamma=0.5)
    runner = make_batched_adam_runner(
        core,
        fixed_params=tuple(core.default_fixed_params)
        + ("lengthscales", "kernel_variance", "likelihood_variance"),
        max_iter=100, learning_rate=1e-2, check_every=10, persistence=100,
    )
    res = run_tile_batch(
        batch,
        {"lengthscales": np.ones(2), "kernel_variance": 1.0, "likelihood_variance": 0.01},
        runner, core,
    )
    # q was actually fitted: predictions track the data, not the zero prior
    live = batch.pred_mask > 0
    err = np.abs(res["f_mean"] - np.sin(batch.Xnew[..., 0]))[live]
    assert np.isfinite(res["f_mean"]).all()
    assert err.mean() < 0.2, f"inducing_mean not fitted (mean err {err.mean()})"


def test_chunked_elbo_matches_unchunked():
    """Large-N SVGP: chunk-accumulated expected log-likelihood reproduces
    the materialized ELBO and its gradients to f64 roundoff."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpsat_tpu.models import svgp

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
        "inducing_mean": jnp.asarray(rng.normal(size=M)),
        "inducing_chol": jnp.asarray(np.tril(np.eye(M) + 0.05 * rng.normal(size=(M, M)))),
    }
    for lik in ("Gaussian", "StudentT"):
        v0 = float(svgp.elbo(cp, data, kernel="Matern32", likelihood=lik))
        v1 = float(svgp.elbo(cp, data, kernel="Matern32", likelihood=lik, chunk_size=128))
        np.testing.assert_allclose(v1, v0, rtol=1e-12)
    g0 = jax.grad(lambda c: svgp.elbo(c, data, kernel="Matern32"))(cp)
    g1 = jax.grad(lambda c: svgp.elbo(c, data, kernel="Matern32", chunk_size=128))(cp)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-7, atol=1e-8)


def test_collapsed_solver_beats_adam_parity():
    """solver='auto' (Gaussian): L-BFGS on the collapsed bound + exact
    final q reaches an ELBO >= the Adam parity run on every lane, in ~20
    iterations instead of ~2000 (VERDICT r2 #3), and the stored params
    reproduce the reported ELBO exactly."""
    import jax.numpy as jnp
    import numpy as np

    from bench_models import make_batch
    from gpsat_tpu.models.svgp import elbo as svgp_elbo, make_svgp_core
    from gpsat_tpu.parallel.engine import (
        make_batched_adam_runner,
        make_batched_runner,
        run_tile_batch,
    )

    B, N, P = 8, 256, 8
    batch = make_batch(B, N, P, 2, np.float64)
    init = {"smart_init": True}

    core_a = make_svgp_core(jitter=1e-8, num_inducing_points=32, solver="adam", q_init=None)
    assert core_a.optimizer == "adam"
    run_a = make_batched_adam_runner(
        core_a, fixed_params=tuple(core_a.default_fixed_params),
        max_iter=1500, learning_rate=1e-2, check_every=10, persistence=100,
    )
    res_a = run_tile_batch(batch, dict(init), run_a, core_a)

    core_c = make_svgp_core(jitter=1e-8, num_inducing_points=32)  # auto -> collapsed
    assert core_c.optimizer == "lbfgs"
    run_c = make_batched_runner(
        core_c, fixed_params=tuple(core_c.default_fixed_params),
        max_iter=300, tol_grad=1e-6, tol_f=1e-11,
    )
    res_c = run_tile_batch(batch, dict(init), run_c, core_c)

    elbo_a, elbo_c = -res_a["objective"], -res_c["objective"]
    assert (elbo_c >= elbo_a - 1e-6).all(), (elbo_c - elbo_a)
    assert res_c["num_iter"].mean() < 100
    assert res_c["converged"].all()

    # reported objective == true SVGP ELBO at the finalized (stored) q
    i = 0
    cp = {k: jnp.asarray(np.asarray(res_c[k])[i]) for k in core_c.param_names}
    d = {"X": jnp.asarray(batch.X[i]), "y": jnp.asarray(batch.y[i]), "mask": jnp.asarray(batch.mask[i])}
    np.testing.assert_allclose(
        float(svgp_elbo(cp, d, kernel="Matern32", jitter=1e-8)), float(elbo_c[i]), rtol=1e-10
    )


def test_collapsed_q_is_sgpr_optimum():
    """collapsed_q plugged into the SVGP ELBO reproduces the SGPR
    collapsed bound exactly (the identity the solver mode relies on)."""
    import jax.numpy as jnp
    import numpy as np

    from gpsat_tpu.models import sgpr, svgp

    rng = np.random.default_rng(0)
    N, M = 300, 32
    X = rng.uniform(0, 5, (N, 2))
    y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=N)
    mask = np.ones(N)
    mask[-20:] = 0
    data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.asarray(mask)}
    cp = {
        "lengthscales": jnp.asarray([1.0, 1.3]),
        "kernel_variance": jnp.asarray(0.8),
        "likelihood_variance": jnp.asarray(0.05),
        "inducing_points": jnp.asarray(X[rng.choice(N, M, replace=False)]),
    }
    q_mu, q_sqrt = svgp.collapsed_q(cp, data, kernel="Matern32", jitter=1e-8)
    e_svgp = float(svgp.elbo(
        {**cp, "inducing_mean": q_mu, "inducing_chol": q_sqrt},
        data, kernel="Matern32", jitter=1e-8,
    ))
    e_sgpr = float(sgpr.elbo(cp, data, kernel="Matern32", jitter=1e-8))
    np.testing.assert_allclose(e_svgp, e_sgpr, rtol=1e-10)
    # and perturbing q strictly lowers the ELBO (it is the argmax)
    e_pert = float(svgp.elbo(
        {**cp, "inducing_mean": q_mu + 0.01, "inducing_chol": q_sqrt},
        data, kernel="Matern32", jitter=1e-8,
    ))
    assert e_pert < e_sgpr


def test_knob_interactions():
    """Interaction matrix of the SVGP optimizer knobs (VERDICT r2 weak #7):
    explicit natural_gradients keeps the Adam path under solver='auto';
    solver='collapsed' rejects natural_gradients and non-Gaussian
    likelihoods; compaction knobs warn-and-ignore on Adam lanes."""
    import numpy as np
    import pandas as pd
    import pytest

    from gpsat_tpu.models.svgp import make_svgp_core

    # auto + natgrad request -> adam (the only path natgrad exists on)
    core = make_svgp_core(num_inducing_points=16, natural_gradients=True)
    assert core.optimizer == "adam" and core.natgrad_update is not None
    core = make_svgp_core(num_inducing_points=16, natural_gradients="exact")
    assert core.optimizer == "adam"

    # plain auto Gaussian -> collapsed lbfgs
    core = make_svgp_core(num_inducing_points=16)
    assert core.optimizer == "lbfgs" and "collapsed" in core.name
    # non-Gaussian -> joint L-BFGS over hypers + q (full-batch; measured
    # better ELBO than Adam at 2-8x fewer iterations)
    core = make_svgp_core(num_inducing_points=16, likelihood="StudentT")
    assert core.optimizer == "lbfgs" and "lbfgs" in core.name
    # ...with q optimized by gradient (not fixed), warm-started on-device
    assert "inducing_mean" not in core.default_fixed_params
    assert core.device_init is not None
    # explicit solver='adam' restores reference behavior; natgrad implies adam
    assert make_svgp_core(num_inducing_points=16, likelihood="StudentT", solver="adam").optimizer == "adam"
    assert make_svgp_core(num_inducing_points=16, likelihood="StudentT", natural_gradients=True).optimizer == "adam"

    with pytest.raises(AssertionError, match="natural_gradients"):
        make_svgp_core(num_inducing_points=16, solver="collapsed", natural_gradients=True)
    with pytest.raises(AssertionError, match="natural_gradients"):
        make_svgp_core(num_inducing_points=16, solver="lbfgs", natural_gradients=True)
    with pytest.raises(AssertionError, match="Gaussian"):
        make_svgp_core(num_inducing_points=16, solver="collapsed", likelihood="StudentT")
    with pytest.raises(AssertionError, match="Gaussian"):
        make_svgp_core(num_inducing_points=16, natural_gradients="exact", likelihood="StudentT")

    # adam lane + compaction knobs: warn and ignore (orchestrator-level)
    from gpsat_tpu.experts import LocalExpertOI

    rng = np.random.default_rng(0)
    df = pd.DataFrame({"x": rng.uniform(0, 4, 150), "y": rng.uniform(0, 4, 150)})
    df["obs"] = np.sin(df["x"]) + 0.05 * rng.normal(size=150)
    oi = LocalExpertOI(
        expert_loc_config={"source": pd.DataFrame({"x": [2.0], "y": [2.0]})},
        data_config={"data_source": df, "obs_col": "obs", "coords_col": ["x", "y"],
                     "local_select": [{"col": ["x", "y"], "comp": "<", "val": 5.0}]},
        model_config={"oi_model": "GPflowSVGPModel",
                      # solver='adam' forced: auto now routes StudentT to the
                      # joint-lbfgs path, where carry_iters is legitimate
                      "init_params": {"num_inducing_points": 16, "likelihood": "StudentT",
                                      "solver": "adam"},
                      "optim_kwargs": {"max_iter": 30, "carry_iters": 10}},
        pred_loc_config={"method": "expert_loc"},
    )
    import tempfile, os, warnings as W

    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        oi.run(store_path=os.path.join(tempfile.mkdtemp(), "oi.h5"))
    assert any("carry_iters" in str(w.message) for w in rec)


def test_predict_only_honors_loaded_q():
    """optimise=False: device_init/finalize_params must NOT override
    loaded variational params — predict-only reruns (smoothing, xval)
    use stored q verbatim."""
    import numpy as np

    from bench_models import make_batch
    from gpsat_tpu.models.svgp import make_svgp_core
    from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

    B, N, P = 2, 128, 4
    batch = make_batch(B, N, P, 2, np.float64)
    core = make_svgp_core(num_inducing_points=16)  # collapsed (has both hooks)
    M = 16
    rng = np.random.default_rng(0)
    q_mu = rng.normal(size=(B, M))
    q_sqrt = np.tile(np.eye(M), (B, 1, 1)) * 0.5
    runner = make_batched_runner(
        core, fixed_params=tuple(core.default_fixed_params),
        max_iter=50, optimise=False,
    )
    res = run_tile_batch(
        batch,
        {"likelihood_variance": 0.01, "inducing_mean": q_mu, "inducing_chol": q_sqrt},
        runner, core,
    )
    np.testing.assert_allclose(res["inducing_mean"], q_mu, rtol=1e-12)
    np.testing.assert_allclose(res["inducing_chol"], q_sqrt, rtol=1e-12)


def test_device_init_honors_loaded_q():
    """q_init='auto' (default): the in-graph collapsed warm start must NOT
    clobber an explicitly provided q (load_params warm starts) — it only
    replaces the untouched default (zero mean, identity chol)."""
    import jax.numpy as jnp
    import numpy as np

    from gpsat_tpu.models.svgp import make_svgp_core

    M, N, D = 8, 64, 2
    rng = np.random.default_rng(0)
    core = make_svgp_core(num_inducing_points=M, likelihood="Bernoulli")
    assert core.device_init is not None
    data = {
        "X": jnp.asarray(rng.uniform(-2, 2, (N, D))),
        "y": jnp.asarray(np.sign(rng.normal(size=N))),
        "mask": jnp.ones(N),
    }
    cp = core.init_cparams(D)
    cp["inducing_points"] = np.asarray(data["X"][:M])
    u_default = {k: jnp.asarray(v) for k, v in core.inverse({k: jnp.asarray(v) for k, v in cp.items()}).items()}

    # default q -> replaced by the collapsed warm start
    out = core.device_init(u_default, data)
    assert float(jnp.abs(out["inducing_mean"]).max()) > 1e-6

    # explicit q -> preserved bit-for-bit
    q_mu = jnp.asarray(rng.normal(size=M))
    q_sqrt = jnp.asarray(np.tril(rng.normal(size=(M, M)) * 0.1 + np.eye(M)))
    u_loaded = {**u_default, "inducing_mean": q_mu, "inducing_chol": q_sqrt}
    out = core.device_init(u_loaded, data)
    np.testing.assert_array_equal(np.asarray(out["inducing_mean"]), np.asarray(q_mu))
    np.testing.assert_array_equal(np.asarray(out["inducing_chol"]), np.asarray(q_sqrt))

    # q_init='collapsed' forces the replacement even for a loaded q
    core_f = make_svgp_core(num_inducing_points=M, likelihood="Bernoulli", q_init="collapsed")
    out = core_f.device_init(u_loaded, data)
    assert float(jnp.abs(np.asarray(out["inducing_mean"]) - np.asarray(q_mu)).max()) > 1e-8

    # q_init=None disables the hook entirely
    assert make_svgp_core(num_inducing_points=M, likelihood="Bernoulli", q_init=None).device_init is None


def test_host_lbfgs_q_init_auto():
    """Host q_init='auto': warm start only when q is at its default."""
    import numpy as np

    from gpsat_tpu.models.svgp import SVGPModel

    rng = np.random.default_rng(5)
    X = rng.uniform(-3, 3, (120, 2))
    y = np.sign(np.sin(X[:, 0]))
    M = 12

    def fresh():
        return SVGPModel(coords=X, obs=y, num_inducing_points=M, likelihood="Bernoulli")

    # default q + auto -> collapsed warm start applied (max_iter=0 freezes)
    m = fresh()
    m._optimise_lbfgs(max_iter=0)
    assert np.abs(m.get_inducing_mean()).max() > 1e-8

    # explicit q + auto -> preserved
    m = fresh()
    q_mu = rng.normal(size=M)
    m.set_inducing_mean(q_mu)
    m._optimise_lbfgs(max_iter=0)
    np.testing.assert_array_equal(m.get_inducing_mean()[:, 0], q_mu)

    # explicit q + forced collapsed -> replaced
    m = fresh()
    m.set_inducing_mean(q_mu)
    m._optimise_lbfgs(max_iter=0, q_init="collapsed")
    assert np.abs(m.get_inducing_mean()[:, 0] - q_mu).max() > 1e-8


def test_elbo_dtype_stable_under_x64():
    """f32 tiles must stay f32 even with jax_enable_x64 on (the CPU test /
    polish environment): the Gauss-Hermite quadrature nodes used to leak
    f64 into the StudentT/Bernoulli ELBOs, which broke the f32 L-BFGS
    while_loop carry (step f32 -> f64 promotion)."""
    import jax.numpy as jnp
    import numpy as np

    from gpsat_tpu.models import svgp

    M, N, D = 8, 32, 2
    rng = np.random.default_rng(0)
    cp = {
        "lengthscales": jnp.ones(D, jnp.float32),
        "kernel_variance": jnp.asarray(1.0, jnp.float32),
        "likelihood_variance": jnp.asarray(0.5, jnp.float32),
        "inducing_points": jnp.asarray(rng.uniform(-2, 2, (M, D)).astype(np.float32)),
        "inducing_mean": jnp.zeros(M, jnp.float32),
        "inducing_chol": jnp.eye(M, dtype=jnp.float32),
    }
    data = {
        "X": jnp.asarray(rng.uniform(-2, 2, (N, D)).astype(np.float32)),
        "y": jnp.asarray(rng.normal(size=N).astype(np.float32)),
        "mask": jnp.ones(N, jnp.float32),
    }
    for lik in ("Gaussian", "StudentT", "Bernoulli", "Poisson"):
        e = svgp.elbo(cp, data, kernel="Matern32", likelihood=lik, jitter=1e-5)
        assert e.dtype == jnp.float32, (lik, e.dtype)
        assert np.isfinite(float(e))


def test_host_collapsed_solver():
    """Host SVGPModel optimise_parameters(solver='collapsed'): reaches an
    ELBO >= the Adam run in far fewer iterations, and the stored q is the
    exact collapsed optimum."""
    import numpy as np

    from gpsat_tpu.models.svgp import SVGPModel

    rng = np.random.default_rng(2)
    X = rng.uniform(0, 5, (250, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.05 * rng.normal(size=250)

    m_adam = SVGPModel(coords=X, obs=y, num_inducing_points=32, noise_variance=0.01)
    m_adam.optimise_parameters(max_iter=1500, learning_rate=1e-2)
    e_adam = m_adam.get_objective_function_value()

    m_col = SVGPModel(coords=X, obs=y, num_inducing_points=32, noise_variance=0.01)
    m_col.set_inducing_points(m_adam.get_inducing_points())  # same Z
    assert m_col.optimise_parameters(solver="collapsed")
    e_col = m_col.get_objective_function_value()
    assert e_col >= e_adam - 1e-6, (e_col, e_adam)
    assert m_col._last_num_iter < 200 < m_adam._last_num_iter
    pred = m_col.predict(np.array([[2.5, 2.5]]), apply_scale=False)
    assert np.isfinite(pred["f*"]).all() and float(pred["f*_var"][0]) > 0


def test_host_joint_lbfgs_solver_nongaussian():
    """solver='lbfgs' (joint L-BFGS over hypers + whitened q) on a
    Bernoulli lane: final ELBO >= the Adam run's, far fewer iterations."""
    import numpy as np

    from gpsat_tpu.models.svgp import SVGPModel

    rng = np.random.default_rng(3)
    X = rng.uniform(-4, 4, (200, 2))
    f = np.sin(X[:, 0]) + 0.5 * np.cos(1.3 * X[:, 1])
    y = ((rng.uniform(0, 1, 200) < 1 / (1 + np.exp(-2 * f))).astype(float) * 2 - 1)

    m_adam = SVGPModel(coords=X, obs=y, num_inducing_points=24, likelihood="Bernoulli")
    m_adam.optimise_parameters(max_iter=1500, learning_rate=1e-2)
    e_adam = m_adam.get_objective_function_value()

    m_lb = SVGPModel(coords=X, obs=y, num_inducing_points=24, likelihood="Bernoulli")
    m_lb.set_inducing_points(m_adam.get_inducing_points())  # same Z
    m_lb.optimise_parameters(solver="lbfgs")
    e_lb = m_lb.get_objective_function_value()
    assert e_lb >= e_adam - 1e-6, (e_lb, e_adam)
    assert m_lb._last_num_iter < m_adam._last_num_iter
    pred = m_lb.predict(np.array([[0.0, 0.0]]), apply_scale=False)
    assert np.isfinite(pred["f*"]).all() and float(pred["f*_var"][0]) > 0


def test_batched_joint_lbfgs_nongaussian():
    """Engine path: auto-routed non-Gaussian cores (optimizer='lbfgs')
    optimize q by gradient and beat the Adam core's ELBO per lane."""
    import numpy as np

    from bench_models import make_batch
    from gpsat_tpu.models.svgp import make_svgp_core
    from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

    B, N, P = 2, 128, 4
    batch = make_batch(B, N, P, 2, np.float64)
    batch.y[:] = np.where(batch.y > 0, 1.0, -1.0)  # Bernoulli encoding

    def run(core, max_iter):
        runner = make_batched_runner(
            core, fixed_params=tuple(core.default_fixed_params), max_iter=max_iter,
        )
        return run_tile_batch(batch, {}, runner, core)

    core_lb = make_svgp_core(num_inducing_points=16, likelihood="Bernoulli")
    assert core_lb.optimizer == "lbfgs"
    res_lb = run(core_lb, 600)

    core_ad = make_svgp_core(num_inducing_points=16, likelihood="Bernoulli", solver="adam")
    assert core_ad.optimizer == "adam"
    res_ad = run(core_ad, 1500)

    # objective is the negative ELBO — lower is better
    assert np.all(res_lb["objective"] <= res_ad["objective"] + 1e-6), (
        res_lb["objective"], res_ad["objective"])
    assert np.isfinite(res_lb["f_mean"]).all()
    # q actually moved off the warm start (it is a free gradient variable)
    assert np.abs(res_lb["inducing_mean"]).max() > 1e-3
