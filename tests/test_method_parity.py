"""Method-level parity with the reference classes: public methods beyond
the core contract (ref: GPSat/local_experts.py, dataloader.py,
gpytorch_models.py, pure_python_gpr.py, gpflow_models.py:331-349)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def small_xy():
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 4, (60, 2))
    y = np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.05 * rng.normal(size=60)
    return x, y


class TestTorchConstraints:
    def test_interval_preserves_value_and_bounds_fit(self, small_xy):
        from gpsat_tpu.models.torch_gpr import TorchGPRModel

        x, y = small_xy
        m = TorchGPRModel(coords=x, obs=y)
        m.set_lengthscales(np.array([0.9, 1.2]))
        m.set_parameter_constraints({
            "lengthscales": {"low": 0.5, "high": 2.0},
            "likelihood_variance": {"low": 1e-4, "high": 0.1},
        })
        # re-wrapping keeps the current value
        np.testing.assert_allclose(m.get_lengthscales(), [0.9, 1.2], atol=1e-4)
        assert m.optimise_parameters(n_iter=25)
        ls = m.get_lengthscales()
        assert np.all(ls >= 0.5) and np.all(ls <= 2.0)
        lv = m.get_likelihood_variance()
        assert 1e-4 <= lv <= 0.1

    def test_set_value_respects_interval_inverse(self, small_xy):
        from gpsat_tpu.models.torch_gpr import TorchGPRModel

        x, y = small_xy
        m = TorchGPRModel(coords=x, obs=y)
        m.set_kernel_variance_constraints(0.3, 3.0)
        m.set_kernel_variance(1.7)
        assert abs(m.get_kernel_variance() - 1.7) < 1e-4


class TestPureNumpyParity:
    def test_optimise_alias_and_loglik(self, small_xy):
        from gpsat_tpu.models.pure_numpy_gpr import PureNumpyGPR

        x, y = small_xy
        m = PureNumpyGPR(coords=x, obs=y, likeli_var=0.1)
        assert np.isclose(m.get_loglikelihood(), -m.get_objective_function_value())
        assert m.optimise(jac=True)
        assert m.get_loglikelihood() > -1e6

    def test_constraints_bound_the_optimum(self, small_xy):
        from gpsat_tpu.models.pure_numpy_gpr import PureNumpyGPR

        x, y = small_xy
        m = PureNumpyGPR(coords=x, obs=y)
        m.set_parameter_constraints({
            "lengthscales": {"low": 0.5, "high": 0.8},
            "likelihood_variance": {"low": 1e-3, "high": 1.0},
        })
        assert m.optimise_parameters()
        assert np.all(m.get_lengthscales() >= 0.5 - 1e-9)
        assert np.all(m.get_lengthscales() <= 0.8 + 1e-9)
        assert m.get_likelihood_variance() >= 1e-3 - 1e-12

    def test_get_set_parameters(self, small_xy):
        from gpsat_tpu.models.pure_numpy_gpr import PureNumpyGPR

        x, y = small_xy
        m = PureNumpyGPR(coords=x, obs=y)
        m.set_parameters(lengthscales=[2.0, 3.0], kernel_variance=1.5)
        p = m.get_parameters()
        np.testing.assert_allclose(p["lengthscales"], [2.0, 3.0])
        assert p["kernel_variance"] == 1.5


class TestASVGPConstraints:
    def test_constraint_setters_clip_and_bound(self):
        from gpsat_tpu.models.asvgp import ASVGPModel

        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(0, 6, 80))[:, None]
        y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=80)
        m = ASVGPModel(coords=x, obs=y, kernel="Matern32", num_inducing_features=20)
        m.set_parameter_constraints({"lengthscales": {"low": 0.4, "high": 3.0}})
        assert m.optimise_parameters(max_iter=100)
        ls = m.get_lengthscales()
        assert np.all(ls >= 0.4) and np.all(ls <= 3.0)


class TestUpdateObsData:
    def test_swap_matches_fresh_model(self, small_xy):
        from gpsat_tpu.models.gpr import GPRModel

        x, y = small_xy
        rng = np.random.default_rng(1)
        x2 = rng.uniform(0, 4, (40, 2))
        y2 = np.cos(x2[:, 0]) + 0.05 * rng.normal(size=40)

        m = GPRModel(coords=x, obs=y, noise_variance=0.05)
        m.set_lengthscales([1.3, 0.8])
        m.update_obs_data(coords=x2, obs=y2)
        fresh = GPRModel(coords=x2, obs=y2, noise_variance=0.05)
        fresh.set_lengthscales([1.3, 0.8])
        np.testing.assert_allclose(
            m.get_objective_function_value(),
            fresh.get_objective_function_value(), rtol=1e-10)
        p1 = m.predict(coords=np.array([[1.0, 1.0]]))
        p2 = fresh.predict(coords=np.array([[1.0, 1.0]]))
        np.testing.assert_allclose(p1["f*"], p2["f*"], rtol=1e-10)


class TestDataLoaderMethods:
    def test_add_data_to_col(self):
        from gpsat_tpu.dataloader import DataLoader

        df = pd.DataFrame({"a": [1, 2, 3]})
        out = DataLoader.add_data_to_col(df, {"date": "2020-01-01"})
        assert (out["date"] == "2020-01-01").all() and len(out) == 3
        out2 = DataLoader.add_data_to_col(df, {"date": ["d1", "d2"]})
        assert len(out2) == 6 and set(out2["date"]) == {"d1", "d2"}

    def test_is_list_of_dict(self):
        from gpsat_tpu.dataloader import DataLoader

        assert DataLoader.is_list_of_dict([{"a": 1}])
        assert not DataLoader.is_list_of_dict([1, 2])
        assert not DataLoader.is_list_of_dict("nope")

    def test_get_where_list_legacy(self):
        from gpsat_tpu.dataloader import DataLoader

        w = DataLoader.get_where_list_legacy(
            read_in_by={"t": {"values": [1, 2, 3], "how": "interval"}})
        assert w == [["t >= 1", "t < 2"], ["t >= 2", "t < 3"]]
        w2 = DataLoader.get_where_list_legacy(
            read_in_by={"d": {"values": ["a", "b"], "how": "=="}})
        assert w2 == [["d == 'a'"], ["d == 'b'"]]
        # cross-product of two keys
        w3 = DataLoader.get_where_list_legacy(read_in_by={
            "t": {"values": [1, 2], "how": ">="},
            "d": {"values": ["a"], "how": "=="},
        })
        assert w3 == [["t >= 1", "d == 'a'"], ["t >= 2", "d == 'a'"]]
        assert DataLoader.get_where_list_legacy(where="x > 1") == ["x > 1"]

    def test_write_to_netcdf_round_trip(self, tmp_path):
        from gpsat_tpu.dataloader import DataLoader
        from gpsat_tpu.data.netcdf import read_netcdf

        p = str(tmp_path / "out.nc")
        df = pd.DataFrame({
            "lat": [10.0, 10.0, 20.0, 20.0],
            "lon": [1.0, 2.0, 1.0, 2.0],
            "v": [1.0, 2.0, 3.0, 4.0],
        }).set_index(["lat", "lon"])
        DataLoader.write_to_netcdf(df, p)
        back = read_netcdf(p).reset_index()
        assert sorted(back["v"]) == [1.0, 2.0, 3.0, 4.0]

    def test_marshalling_aliases(self):
        from gpsat_tpu.dataloader import DataLoader

        assert callable(DataLoader.make_multiindex_df)
        assert callable(DataLoader.mindex_df_to_mindex_dataarray)


class TestLocalExpertMethods:
    def test_set_data_source_infers_engine(self):
        from gpsat_tpu.experts import LocalExpertData

        d = LocalExpertData(data_source="/tmp/foo.csv")
        d.set_data_source()
        assert d.engine == "read_csv"
        d2 = LocalExpertData(data_source="/tmp/foo.h5", engine="tablestore")
        d2.set_data_source()
        assert d2.engine == "tablestore"

    def test_dict_of_array_to_table(self):
        from gpsat_tpu.experts import LocalExpertOI

        out = LocalExpertOI.dict_of_array_to_table(
            {"a": np.arange(3.0), "b": np.arange(6.0).reshape(2, 3)},
            ref_loc={"x": 1.0, "y": 2.0})
        assert set(out) == {"a", "b"}
        assert out["a"].index.names == ["x", "y"]
        assert (out["a"].index == pd.MultiIndex.from_tuples([(1.0, 2.0)] * 3)).all()
        cat = LocalExpertOI.dict_of_array_to_table(
            {"a": np.arange(3.0), "c": np.arange(4.0)},
            ref_loc={"x": 1.0}, concat=True, table="tbl")
        assert "tbl" in cat

    def test_load_params_per_model(self, tmp_path):
        """Reference signature: read one expert's params from a store file
        into a host model (ref: local_experts.py:553-606)."""
        from gpsat_tpu.data.store import TableStore
        from gpsat_tpu.experts import LocalExpertOI
        from gpsat_tpu.models.gpr import GPRModel

        p = str(tmp_path / "res.h5")
        ls = pd.DataFrame({
            "x": [1.0, 1.0, 5.0, 5.0],
            "y": [2.0, 2.0, 6.0, 6.0],
            "_dim_0": [0, 1, 0, 1],
            "lengthscales": [1.5, 2.5, 7.0, 8.0],
        }).set_index(["x", "y"])
        kv = pd.DataFrame({
            "x": [1.0, 5.0], "y": [2.0, 6.0],
            "kernel_variance": [0.7, 0.9],
        }).set_index(["x", "y"])
        with TableStore(p) as s:
            s.append("lengthscales", ls)
            s.append("kernel_variance", kv)

        rng = np.random.default_rng(0)
        m = GPRModel(coords=rng.uniform(size=(20, 2)), obs=rng.normal(size=20))
        oi = LocalExpertOI.__new__(LocalExpertOI)  # method needs no run state
        rc = oi.load_params(m, file=p, ref_loc={"x": 1.0, "y": 2.0})
        assert rc == 0
        np.testing.assert_allclose(m.get_lengthscales(), [1.5, 2.5])
        assert abs(m.get_kernel_variance() - 0.7) < 1e-12
        # missing location -> 1, params untouched
        rc2 = oi.load_params(m, file=p, ref_loc={"x": 99.0, "y": 99.0})
        assert rc2 == 1
        np.testing.assert_allclose(m.get_lengthscales(), [1.5, 2.5])
        # direct param_dict path
        rc3 = oi.load_params(m, likelihood_variance=0.33)
        assert rc3 == 0 and abs(m.get_likelihood_variance() - 0.33) < 1e-12
