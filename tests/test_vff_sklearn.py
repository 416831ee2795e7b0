"""VFF and sklearn-model tests.

VFF oracle property: with enough Fourier features on a wide domain the
collapsed bound approaches the exact GPR marginal likelihood and the
posterior approaches the exact GPR posterior (Hensman et al. 2017).
"""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.models import get_model
from gpsat_tpu.models.gpr import GPRModel
from gpsat_tpu.models.sklearn_model import SklearnGPRModel
from gpsat_tpu.models.vff import VFFModel


@pytest.fixture(scope="module")
def data_1d():
    rng = np.random.default_rng(8)
    x = np.sort(rng.uniform(0.5, 9.5, 60))
    y = np.sin(x) + 0.1 * rng.normal(size=60)
    return pd.DataFrame({"x": x, "y": y})


class TestVFF:
    def test_elbo_approaches_lml(self, data_1d):
        gpr = GPRModel(data=data_1d, coords_col="x", obs_col="y", obs_mean=None)
        gpr.set_parameters(lengthscales=1.2, kernel_variance=1.0, likelihood_variance=0.01)
        lml = -gpr.get_objective_function_value()

        # the VFF bound tightens monotonically in M but converges to a value
        # strictly below the LML (restricted variational family — Hensman
        # et al. 2017, Fig. 3); assert monotone tightening + convergence
        gaps = []
        for M in [5, 15, 40, 100]:
            vff = VFFModel(
                data=data_1d, coords_col="x", obs_col="y", obs_mean=None,
                num_inducing_features=M, domain_size=7.0, expert_loc=[5.0],
            )
            vff.set_parameters(lengthscales=np.array([1.2]), kernel_variance=1.0, likelihood_variance=0.01)
            gap = lml - vff.get_objective_function_value()
            assert gap > -1e-6, f"ELBO must lower-bound the LML (gap={gap})"
            if gaps:
                assert gap <= gaps[-1] + 1e-9, "bound must tighten with more features"
            gaps.append(gap)
        assert gaps[-1] < 5.0, f"converged bound unreasonably loose: {gaps[-1]}"
        assert gaps[-2] - gaps[-1] < 0.7, "bound should have nearly converged by M=40"

    def test_predictions_approach_gpr(self, data_1d):
        gpr = GPRModel(data=data_1d, coords_col="x", obs_col="y", obs_mean=None)
        gpr.set_parameters(lengthscales=1.2, kernel_variance=1.0, likelihood_variance=0.01)
        xs = np.linspace(1, 9, 21)[:, None]
        ref = gpr.predict(xs)

        vff = VFFModel(
            data=data_1d, coords_col="x", obs_col="y", obs_mean=None,
            num_inducing_features=40, domain_size=7.0, expert_loc=[5.0],
        )
        vff.set_parameters(lengthscales=np.array([1.2]), kernel_variance=1.0, likelihood_variance=0.01)
        out = vff.predict(xs)
        np.testing.assert_allclose(out["f*"], ref["f*"], atol=2e-2)
        np.testing.assert_allclose(out["f*_var"], ref["f*_var"], atol=2e-2)

    def test_optimise_and_2d(self):
        rng = np.random.default_rng(9)
        n = 300
        df = pd.DataFrame({"x": rng.uniform(0, 6, n), "y": rng.uniform(0, 6, n)})
        df["obs"] = np.sin(df.x) * np.cos(df.y) + 0.05 * rng.normal(size=n)
        vff = VFFModel(
            data=df, coords_col=["x", "y"], obs_col="obs", obs_mean=None,
            num_inducing_features=10, domain_size=4.0, expert_loc=[3.0, 3.0],
        )
        ok = vff.optimise_parameters(max_iter=200)
        assert ok
        pred = vff.predict(np.array([[3.0, 3.0]]))
        truth = np.sin(3.0) * np.cos(3.0)
        assert abs(pred["f*"][0] - truth) < 0.1
        assert pred["f*_var"][0] > 0

    def test_registry(self):
        assert get_model("GPflowVFFModel") is VFFModel

    def test_batched_core_matches_host_model(self):
        """GPflowVFFModel through LocalExpertOI runs on the batched engine
        (make_vff_core: per-expert [a, b]^D domains as a fixed param)."""
        import os
        import tempfile

        import pandas as pd

        from gpsat_tpu.data.store import TableStore
        from gpsat_tpu.experts import LocalExpertOI

        rng = np.random.default_rng(4)
        n = 250
        df = pd.DataFrame({"x": rng.uniform(-3, 3, n), "y": rng.uniform(-3, 3, n)})
        df["obs"] = np.sin(df["x"]) * np.cos(df["y"]) + 0.05 * rng.normal(size=n)
        p = os.path.join(tempfile.mkdtemp(), "vff.h5")
        oi = LocalExpertOI(
            expert_loc_config={"source": pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 0.0]})},
            data_config={"data_source": df, "obs_col": "obs", "coords_col": ["x", "y"],
                         "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}]},
            model_config={"oi_model": "GPflowVFFModel",
                          "init_params": {"kernel": "Matern32", "num_inducing_features": 10,
                                           "noise_variance": 0.0025},
                          "optim_kwargs": {"max_iter": 300, "linesearch": "single_eval"}},
            pred_loc_config={"method": "expert_loc"},
        )
        oi.run(store_path=p)
        with TableStore(p, mode="r") as s:
            rd = s.select("run_details")
            preds = s.select("preds").reset_index().sort_values(["x", "y"])
        assert rd["optimise_success"].all()
        for (ex, ey), eng in zip([(0.0, 0.0), (1.0, 0.0)], preds["f*"].values):
            hm = VFFModel(coords=df[["x", "y"]].values, obs=df["obs"].values,
                          kernel="Matern32", num_inducing_features=10, noise_variance=0.0025)
            hm.optimise_parameters(max_iter=300)
            host = float(hm.predict(np.array([[ex, ey]]))["f*"][0])
            assert abs(eng - host) < 5e-3

    def test_edge_correction_continuity(self, data_1d):
        # Kuf edge corrections: predictions just outside the domain stay
        # finite and continuous for Matern12/32
        for kern in ["Matern12", "Matern32"]:
            vff = VFFModel(
                data=data_1d, coords_col="x", obs_col="y", obs_mean=None, kernel=kern,
                num_inducing_features=15, domain_size=5.0, expert_loc=[5.0],
            )
            vff.set_parameters(lengthscales=np.array([1.0]), kernel_variance=1.0, likelihood_variance=0.01)
            xs = np.linspace(-1.0, 11.0, 25)[:, None]  # extends past the domain
            out = vff.predict(xs)
            assert np.isfinite(out["f*"]).all()
            assert np.isfinite(out["f*_var"]).all()
            # adjacent predictions shouldn't jump at the boundary
            assert np.max(np.abs(np.diff(out["f*"]))) < 2.0


class TestSklearnModel:
    def test_fit_predict_contract(self, data_1d):
        m = SklearnGPRModel(data=data_1d, coords_col="x", obs_col="y", obs_mean=None, likelihood_variance=0.01)
        m.set_parameter_constraints({"lengthscales": {"low": 1e-10, "high": 5.0}})
        ok = m.optimise_parameters()
        assert ok
        out = m.predict(np.array([[5.0]]))
        for k in ("f*", "f*_var", "f_bar"):
            assert k in out
        params = m.get_parameters()
        assert 1e-10 < params["lengthscales"][0] < 5.0
        assert params["likelihood_variance"] == 0.01

    def test_predict_before_fit(self, data_1d):
        m = SklearnGPRModel(data=data_1d, coords_col="x", obs_col="y", obs_mean=None)
        out = m.predict(np.array([[5.0]]))
        assert np.isfinite(out["f*"]).all()

    def test_registry(self):
        assert get_model("sklearnGPRModel") is SklearnGPRModel


class TestASVGP:
    def test_converges_to_exact_matern12(self, data_1d):
        from gpsat_tpu.models.asvgp import ASVGPModel
        from gpsat_tpu.models.gpr import GPRModel

        g = GPRModel(data=data_1d, coords_col="x", obs_col="y", obs_mean=None, kernel="Matern12")
        g.set_parameters(lengthscales=np.array([1.5]), kernel_variance=1.0, likelihood_variance=0.01)
        lml = -g.get_objective_function_value()
        xs = np.linspace(1, 9, 9)[:, None]
        ref = g.predict(xs)

        prev_gap, prev_err = np.inf, np.inf
        for M in [20, 60, 200]:
            a = ASVGPModel(
                data=data_1d, coords_col="x", obs_col="y", obs_mean=None,
                num_inducing_features=M, margin=1.0,
            )
            a.set_parameters(lengthscales=np.array([1.5]), kernel_variance=1.0, likelihood_variance=0.01)
            gap = lml - a.get_objective_function_value()
            assert 0 < gap < prev_gap, "bound must tighten with finer knots"
            p = a.predict(xs)
            err = np.abs(p["f*"] - ref["f*"]).max()
            assert err < prev_err + 1e-9
            prev_gap, prev_err = gap, err
        assert prev_err < 0.05

    def test_optimise(self, data_1d):
        from gpsat_tpu.models.asvgp import ASVGPModel

        a = ASVGPModel(
            data=data_1d, coords_col="x", obs_col="y", obs_mean=None,
            num_inducing_features=80, margin=1.0, noise_variance=0.01,
        )
        assert a.optimise_parameters(max_iter=200)
        out = a.predict(np.array([[5.0]]))
        assert abs(out["f*"][0] - np.sin(5.0)) < 0.3

    def test_converges_to_exact_matern32(self, data_1d):
        from gpsat_tpu.models.asvgp import ASVGPModel
        from gpsat_tpu.models.gpr import GPRModel

        g = GPRModel(data=data_1d, coords_col="x", obs_col="y", obs_mean=None, kernel="Matern32")
        g.set_parameters(lengthscales=np.array([1.5]), kernel_variance=1.0, likelihood_variance=0.01)
        lml = -g.get_objective_function_value()
        xs = np.linspace(1, 9, 9)[:, None]
        ref = g.predict(xs)

        prev_gap, prev_err = np.inf, np.inf
        for M in [20, 60, 200]:
            a = ASVGPModel(
                data=data_1d, coords_col="x", obs_col="y", obs_mean=None,
                kernel="Matern32", num_inducing_features=M, margin=1.0,
            )
            a.set_parameters(lengthscales=np.array([1.5]), kernel_variance=1.0, likelihood_variance=0.01)
            gap = lml - a.get_objective_function_value()
            assert 0 < gap < prev_gap, "bound must tighten with finer knots"
            p = a.predict(xs)
            err = np.abs(p["f*"] - ref["f*"]).max()
            assert err < prev_err + 1e-9
            prev_gap, prev_err = gap, err
        assert prev_err < 0.05

    @pytest.mark.parametrize(
        "kernel,basis_name,kuu_name,tol",
        [
            ("Matern32", "b2_basis", "matern32_spline_kuu", 2e-3),
            ("Matern52", "b3_basis", "matern52_spline_kuu", 1e-3),
        ],
    )
    def test_spline_kuu_reproduces_kernel(self, kernel, basis_name, kuu_name, tol):
        # Nystrom check of the inter-domain construction:
        # Kfu Kuu^-1 Kuf -> k(x, y) as the knot grid refines
        import jax.numpy as jnp

        from gpsat_tpu.models import asvgp
        from gpsat_tpu.ops.kernels import gram

        basis = getattr(asvgp, basis_name)
        kuu_fn = getattr(asvgp, kuu_name)
        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(0.5, 2.5, 12))
        l, s2 = 0.4, 1.3
        Kexact = np.asarray(gram(kernel, jnp.asarray(x[:, None]), jnp.asarray(x[:, None]), jnp.asarray([l]), s2))
        errs = []
        for M in (16, 128):
            knots = np.linspace(0.0, 3.0, M)
            Kuu = np.asarray(kuu_fn(knots, l, s2))
            Phi = np.asarray(basis(jnp.asarray(x), jnp.asarray(knots), 0))
            errs.append(np.max(np.abs(Phi.T @ np.linalg.solve(Kuu, Phi) - Kexact)))
        assert errs[1] < errs[0] and errs[1] < tol

    def test_converges_to_exact_matern52(self, data_1d):
        from gpsat_tpu.models.asvgp import ASVGPModel
        from gpsat_tpu.models.gpr import GPRModel

        g = GPRModel(data=data_1d, coords_col="x", obs_col="y", obs_mean=None, kernel="Matern52")
        g.set_parameters(lengthscales=np.array([1.5]), kernel_variance=1.0, likelihood_variance=0.01)
        lml = -g.get_objective_function_value()
        xs = np.linspace(1, 9, 9)[:, None]
        ref = g.predict(xs)
        prev_gap, prev_err = np.inf, np.inf
        for M in [20, 60, 200]:
            a = ASVGPModel(
                data=data_1d, coords_col="x", obs_col="y", obs_mean=None,
                kernel="Matern52", num_inducing_features=M, margin=1.0,
            )
            a.set_parameters(lengthscales=np.array([1.5]), kernel_variance=1.0, likelihood_variance=0.01)
            gap = lml - a.get_objective_function_value()
            assert 0 < gap < prev_gap, "bound must tighten with finer knots"
            err = np.abs(a.predict(xs)["f*"] - ref["f*"]).max()
            assert err < prev_err + 1e-9
            prev_gap, prev_err = gap, err
        assert prev_err < 0.05

    def test_batched_core_matches_host_model(self):
        """GPflowASVGPModel through LocalExpertOI now runs on the batched
        engine (make_asvgp_core: per-expert knot grids as a fixed param);
        results must match the host ASVGPModel."""
        import pandas as pd

        from gpsat_tpu.data.store import TableStore
        from gpsat_tpu.experts import LocalExpertOI
        from gpsat_tpu.models.asvgp import ASVGPModel

        rng = np.random.default_rng(4)
        n = 250
        df = pd.DataFrame({"x": rng.uniform(-3, 3, n), "y": rng.uniform(-3, 3, n)})
        df["obs"] = np.sin(df["x"]) * np.cos(df["y"]) + 0.05 * rng.normal(size=n)
        import tempfile, os

        p = os.path.join(tempfile.mkdtemp(), "a.h5")
        oi = LocalExpertOI(
            expert_loc_config={"source": pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 0.0]})},
            data_config={"data_source": df, "obs_col": "obs", "coords_col": ["x", "y"],
                         "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}]},
            model_config={"oi_model": "GPflowASVGPModel",
                          "init_params": {"kernel": "Matern32", "num_inducing_features": 16,
                                           "margin": 0.5, "noise_variance": 0.0025},
                          "optim_kwargs": {"max_iter": 300, "linesearch": "single_eval"}},
            pred_loc_config={"method": "expert_loc"},
        )
        oi.run(store_path=p)
        with TableStore(p, mode="r") as s:
            rd = s.select("run_details")
            preds = s.select("preds").reset_index().sort_values(["x", "y"])
        assert rd["optimise_success"].all()
        for (ex, ey), eng in zip([(0.0, 0.0), (1.0, 0.0)], preds["f*"].values):
            hm = ASVGPModel(coords=df[["x", "y"]].values, obs=df["obs"].values,
                            kernel="Matern32", num_inducing_features=16, margin=0.5,
                            noise_variance=0.0025)
            hm.optimise_parameters(max_iter=300)
            host = float(hm.predict(np.array([[ex, ey]]))["f*"][0])
            assert abs(eng - host) < 5e-3

    def test_unsupported_kernel_gated(self, data_1d):
        from gpsat_tpu.models.asvgp import ASVGPModel

        with pytest.raises(AssertionError, match="spline pairs"):
            ASVGPModel(data=data_1d, coords_col="x", obs_col="y", kernel="RBF", num_inducing_features=10)


class TestVFFDomainGuards:
    def test_matern52_out_of_domain_prediction_raises(self, data_1d):
        # the reference hard-fails on out-of-domain X for Matern52
        # (vff.py:499-517, tf.debugging asserts); silent periodic-extension
        # predictions must not be reachable from the host model
        vff = VFFModel(
            data=data_1d, coords_col="x", obs_col="y", obs_mean=None, kernel="Matern52",
            num_inducing_features=15,
        )
        vff.set_parameters(lengthscales=np.array([1.0]), kernel_variance=1.0, likelihood_variance=0.01)
        with pytest.raises(ValueError, match="domain"):
            vff.predict(np.array([[data_1d["x"].max() + 3.0]]))
        # in-domain prediction still fine
        out = vff.predict(np.array([[float(data_1d["x"].mean())]]))
        assert np.isfinite(out["f*"]).all()

    def test_batched_core_matern52_domain_covers_predictions(self):
        from gpsat_tpu.models.vff import make_vff_core
        from gpsat_tpu.parallel.batching import TileBatch

        rng = np.random.default_rng(0)
        B, N, P = 2, 32, 4
        X = rng.uniform(0.0, 2.0, (B, N, 1))
        batch = TileBatch(
            X=X,
            y=np.sin(X[..., 0]),
            mask=np.ones((B, N)),
            Xnew=rng.uniform(3.0, 4.0, (B, P, 1)),  # outside the data range
            pred_mask=np.ones((B, P)),
            obs_mean=np.zeros(B),
            expert_index=np.arange(B),
            num_obs=np.full(B, N),
        )
        core = make_vff_core(kernel="Matern52", num_inducing_features=8)
        init = core.prepare_batch_init(batch, core.init_cparams(1))
        dom = np.asarray(init["domain"])  # [B, D, 2]
        assert (dom[..., 0] <= X.min(axis=1)).all()
        assert (dom[..., 1] >= batch.Xnew.max(axis=1)).all()
        # Matern32 keeps the data-derived domain (edge corrections handle
        # outside-domain points)
        core32 = make_vff_core(kernel="Matern32", num_inducing_features=8)
        dom32 = np.asarray(core32.prepare_batch_init(batch, core32.init_cparams(1))["domain"])
        assert (dom32[..., 1] < 3.0).all()

    def test_batched_core_domain_centers_on_expert_loc(self):
        from gpsat_tpu.models.vff import make_vff_core
        from gpsat_tpu.parallel.batching import TileBatch

        rng = np.random.default_rng(0)
        B, N = 2, 32
        X = rng.uniform(-1.0, 1.0, (B, N, 1))
        eloc = np.array([[0.5], [-0.5]])
        batch = TileBatch(
            X=X,
            y=np.sin(X[..., 0]),
            mask=np.ones((B, N)),
            Xnew=X[:, :4],
            pred_mask=np.ones((B, 4)),
            obs_mean=np.zeros(B),
            expert_index=np.arange(B),
            num_obs=np.full(B, N),
            expert_loc=eloc,
        )
        core = make_vff_core(kernel="Matern32", num_inducing_features=8, domain_size=10.0)
        dom = np.asarray(core.prepare_batch_init(batch, core.init_cparams(1))["domain"])
        # domain = expert +/- domain_size per side (host-model / reference
        # convention, vff_model.py:178-211) since data fits inside
        np.testing.assert_allclose(dom[..., 0], eloc - 10.0)
        np.testing.assert_allclose(dom[..., 1], eloc + 10.0)
