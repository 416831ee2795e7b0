"""Trainable prior mean functions (Constant / Linear) across the zoo.

The reference passes mean_function strings through to gpflow
(ref: GPSat/models/gpflow_models.py:143-157, 798); this build implements
Constant and Linear natively (gpsat_tpu/models/means.py) for every model
family, host and batched. Oracle: data with a known linear trend — the
fitted mean must recover the slope/intercept and dominate far-field
predictions (where the GP posterior reverts to the prior mean).
"""

import numpy as np
import pytest

SLOPE = np.array([0.7, -0.3])
INTERCEPT = 4.0


def _trend_data(n=220, seed=0, gp_amp=0.3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, (n, 2))
    f = gp_amp * np.sin(2.0 * X[:, 0]) * np.cos(2.0 * X[:, 1])
    y = X @ SLOPE + INTERCEPT + f + 0.05 * rng.normal(size=n)
    return X, y


def _check_linear_fit(model, far=np.array([[60.0, -60.0]])):
    A = model.get_mean_A()
    c = model.get_mean_c()
    # the short-lengthscale GP can absorb a sliver of the trend, so the
    # slope is only identified to ~0.1-0.15 at this data size
    np.testing.assert_allclose(A, SLOPE, atol=0.15)
    assert abs(c - INTERCEPT) < 0.3
    # far from data the posterior reverts to the fitted linear mean
    pred = model.predict(far, apply_scale=False)
    expect = far @ A + c
    np.testing.assert_allclose(np.ravel(pred["f*"]), expect, rtol=0.02)


class TestHostModels:
    def test_gpr_linear(self):
        from gpsat_tpu.models.gpr import GPRModel

        X, y = _trend_data()
        m = GPRModel(coords=X, obs=y, mean_function="Linear", noise_variance=0.0025)
        assert m.param_names[-2:] == ["mean_c", "mean_A"]
        assert m.optimise_parameters(max_iter=500)
        _check_linear_fit(m)

    def test_gpr_linear_beats_zero_mean(self):
        from gpsat_tpu.models.gpr import GPRModel

        X, y = _trend_data()
        m0 = GPRModel(coords=X, obs=y, noise_variance=0.0025)
        m0.optimise_parameters(max_iter=500)
        m1 = GPRModel(coords=X, obs=y, mean_function="Linear", noise_variance=0.0025)
        m1.optimise_parameters(max_iter=500)
        # objective is the NEGATIVE lml for GPR: lower is better
        assert m1.get_objective_function_value() < m0.get_objective_function_value()

    def test_sgpr_linear(self):
        from gpsat_tpu.models.sgpr import SGPRModel

        np.random.seed(0)  # SGPR inducing subset uses the global RNG
        X, y = _trend_data()
        m = SGPRModel(coords=X, obs=y, num_inducing_points=64,
                      mean_function="Linear", noise_variance=0.0025)
        # bound lengthscales: an unbounded GP absorbs the linear trend
        m.set_parameter_constraints({"lengthscales": {"low": 0.05, "high": 2.0}})
        assert m.optimise_parameters(max_iter=500)
        _check_linear_fit(m)

    def test_svgp_constant(self):
        from gpsat_tpu.models.svgp import SVGPModel

        rng = np.random.default_rng(1)
        X = rng.uniform(-2, 2, (150, 2))
        y = 5.0 + 0.3 * np.sin(2 * X[:, 0]) + 0.05 * rng.normal(size=150)
        m = SVGPModel(coords=X, obs=y, num_inducing_points=32,
                      mean_function="Constant", noise_variance=0.0025)
        assert "mean_c" in m.param_names
        m.optimise_parameters(max_iter=800, learning_rate=5e-2)
        # mean_c is only softly identified vs q(u) (the KL pulls the offset
        # into mean_c asymptotically): assert it moved substantially toward
        # the offset and the fitted function is right where it matters
        assert m.get_mean_c() > 1.0
        pred = m.predict(X[:20], apply_scale=False)
        np.testing.assert_allclose(np.ravel(pred["f*"]), y[:20], atol=0.25)

    @pytest.mark.parametrize("cls_kw", [
        ("vff", dict(num_inducing_features=12)),
        ("asvgp", dict(num_inducing_features=20, kernel="Matern12")),
    ])
    def test_vff_asvgp_constant(self, cls_kw):
        name, kw = cls_kw
        from gpsat_tpu.models.asvgp import ASVGPModel
        from gpsat_tpu.models.vff import VFFModel

        cls = VFFModel if name == "vff" else ASVGPModel
        rng = np.random.default_rng(2)
        X = rng.uniform(-2, 2, (200, 2))
        y = 7.0 + 0.3 * np.sin(2 * X[:, 0]) * np.cos(2 * X[:, 1]) + 0.05 * rng.normal(size=200)
        m = cls(coords=X, obs=y, mean_function="Constant", noise_variance=0.0025, **kw)
        assert "mean_c" in m.param_names
        assert m.optimise_parameters(max_iter=500)
        assert abs(m.get_mean_c() - 7.0) < 0.5


class TestBatchedEngine:
    def test_gpr_linear_through_engine(self):
        """Linear mean params optimize inside the jitted batched program
        (gradient flows through the fused LML's analytic y-cotangent)."""
        from gpsat_tpu.models.functional import make_gpr_core
        from gpsat_tpu.parallel.batching import TileBatch
        from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

        from gpsat_tpu.ops import transforms as T

        rng = np.random.default_rng(0)
        B, N, P, D = 4, 160, 4, 2
        X = rng.uniform(-2, 2, (B, N, D))
        y = X @ SLOPE + INTERCEPT + 0.3 * np.sin(2 * X[..., 0]) * np.cos(2 * X[..., 1]) \
            + 0.05 * rng.normal(size=(B, N))
        far = np.tile(np.array([[30.0, -30.0]] * P), (B, 1, 1))
        batch = TileBatch(
            X=X, y=y, mask=np.ones((B, N)), Xnew=far,
            pred_mask=np.ones((B, P)), obs_mean=np.zeros(B),
            expert_index=np.arange(B), num_obs=np.full(B, N),
        )
        # bound lengthscales: an unbounded GP can absorb the linear trend
        # (huge lengthscale ~ linear kernel), making the split unidentified
        bij = {"lengthscales": T.interval(0.05, 5.0),
               "kernel_variance": T.POSITIVE, "likelihood_variance": T.POSITIVE}
        core = make_gpr_core(mean_function="Linear", bijectors=bij)
        assert core.param_names[-2:] == ("mean_c", "mean_A")
        runner = make_batched_runner(core, max_iter=500, tol_grad=1e-6, tol_f=1e-11)
        res = run_tile_batch(
            batch,
            {"likelihood_variance": 0.0025, "kernel_variance": 0.1},
            runner, core,
        )
        assert res["converged"].all()
        np.testing.assert_allclose(res["mean_A"], np.tile(SLOPE, (B, 1)), atol=0.1)
        np.testing.assert_allclose(res["mean_c"], np.full(B, INTERCEPT), atol=0.3)
        expect = far[0] @ SLOPE + INTERCEPT
        for b in range(B):
            np.testing.assert_allclose(
                res["f_mean"][b],
                far[b] @ res["mean_A"][b] + res["mean_c"][b],
                rtol=0.02,
            )

    def test_svgp_collapsed_linear_through_engine(self):
        """Linear mean + collapsed SVGP solver: the mean is a plain L-BFGS
        variable of the collapsed bound, and predictions revert to it."""
        from gpsat_tpu.models.svgp import make_svgp_core
        from gpsat_tpu.parallel.batching import TileBatch
        from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

        from gpsat_tpu.ops import transforms as T

        rng = np.random.default_rng(1)
        B, N, P, D = 2, 200, 2, 2
        X = rng.uniform(-2, 2, (B, N, D))
        y = X @ SLOPE + INTERCEPT + 0.3 * np.sin(2 * X[..., 0]) * np.cos(2 * X[..., 1]) \
            + 0.05 * rng.normal(size=(B, N))
        far = np.tile(np.array([[40.0, 40.0]] * P), (B, 1, 1))
        batch = TileBatch(
            X=X, y=y, mask=np.ones((B, N)), Xnew=far,
            pred_mask=np.ones((B, P)), obs_mean=np.zeros(B),
            expert_index=np.arange(B), num_obs=np.full(B, N),
        )
        bij = {"lengthscales": T.interval(0.05, 5.0),
               "kernel_variance": T.POSITIVE, "likelihood_variance": T.POSITIVE}
        core = make_svgp_core(num_inducing_points=32, mean_function="Linear", bijectors=bij)
        assert core.optimizer == "lbfgs"
        runner = make_batched_runner(
            core, fixed_params=tuple(core.default_fixed_params),
            max_iter=500, tol_grad=1e-6, tol_f=1e-11,
        )
        res = run_tile_batch(
            batch, {"likelihood_variance": 0.0025, "kernel_variance": 0.1}, runner, core
        )
        assert res["converged"].all()
        np.testing.assert_allclose(res["mean_A"], np.tile(SLOPE, (B, 1)), atol=0.2)
        for b in range(B):
            np.testing.assert_allclose(
                res["f_mean"][b], far[b] @ res["mean_A"][b] + res["mean_c"][b], rtol=0.05
            )


def test_linear_intercept_accepts_gpflow_b_naming():
    """gpflow names the Linear intercept 'b' (Linear(A, b)) and the
    Constant one 'c'; both spellings must reach mean_c — a ported
    reference config using 'b' previously lost its intercept silently."""
    import numpy as np
    import pytest

    from gpsat_tpu.models import get_model

    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(40, 2))
    y = 3.0 + X @ np.array([0.5, -0.2]) + 0.01 * rng.normal(size=40)

    def make(mean_func_kwargs):
        return get_model("GPflowGPRModel")(
            coords=X, obs=y, mean_function="Linear", mean_func_kwargs=mean_func_kwargs
        )

    m_b = make({"A": [0.5, -0.2], "b": 3.0})
    m_c = make({"A": [0.5, -0.2], "c": 3.0})
    assert m_b.get_mean_c() == m_c.get_mean_c() == 3.0
    np.testing.assert_array_equal(m_b.get_mean_A(), [0.5, -0.2])

    # unknown keys and inapplicable params raise loudly
    with pytest.raises(AssertionError, match="unknown mean_func_kwargs"):
        make({"slope": [1.0, 1.0]})
    with pytest.raises(AssertionError, match="not applicable"):
        get_model("GPflowGPRModel")(
            coords=X, obs=y, mean_function="Constant", mean_func_kwargs={"A": [1.0, 1.0]}
        )
