"""Tests for datetime utils, expert-location generation, xval expansion,
projections, and weighted values — the reference's pure-function tier."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu import datetime_utils as dtu
from gpsat_tpu.data.expert_locations import (
    generate_local_expert_locations,
    get_masks_for_expert_loc,
    sparse_true_array,
)
from gpsat_tpu.utils import (
    EASE2toWGS84,
    WGS84toEASE2,
    get_weighted_values,
    grid_2d_flatten,
    guess_track_num,
    nll,
    rmse,
)
from gpsat_tpu.xval import XvalConfig


class TestDatetimeUtils:
    def test_gpod_filename(self):
        f = "/path/to/S3A_GPOD_SAR__SRA_A__20191031T233355_20191101T002424_2019112_IL_v3.proc"
        df = pd.DataFrame({"x": np.arange(11)})
        out = dtu.from_file_start_end_datetime_GPOD(f, df)
        assert out[0] == np.datetime64("2019-10-31T23:33:55")
        assert out[-1] == np.datetime64("2019-11-01T00:24:24")
        assert len(out) == 11

    def test_saral_filename(self):
        f = "SARAL_C139_0036_20200331_234125_20200401_003143_CS2mss_IL_v1.proc"
        out = dtu.from_file_start_end_datetime_SARAL(f, np.arange(11))
        assert out[0] == np.datetime64("2020-03-31T23:41:25")
        assert out[-1] == np.datetime64("2020-04-01T00:31:43")

    def test_float_epoch(self):
        out = dtu.datetime_from_float_column(np.array([18262.5]), epoch=(1970, 1, 1))
        assert out[0] == np.datetime64("2020-01-01T12:00:00")

    def test_ymd_cols(self):
        out = dtu.datetime_from_ymd_cols([2021], [1], [10], [123456])
        assert out[0] == np.datetime64("2021-01-10T12:34:56")


class TestProjections:
    def test_pyproj_reference_values(self):
        x, y = WGS84toEASE2(-105.01621, 39.57422)
        np.testing.assert_allclose([x, y], [-5254767.014984061, 1409604.1043472202], rtol=1e-12)
        lon, lat = EASE2toWGS84(1000000, 2000000)
        np.testing.assert_allclose([lon, lat], [153.434948822922, 69.86894542225777], rtol=1e-10)

    def test_roundtrip_south(self):
        lons = np.linspace(-170, 170, 9)
        lats = np.linspace(-85, -40, 9)
        X, Y = WGS84toEASE2(lons, lats, lat_0=-90)
        lo, la = EASE2toWGS84(X, Y, lat_0=-90)
        np.testing.assert_allclose(lo, lons, atol=1e-8)
        np.testing.assert_allclose(la, lats, atol=1e-8)


class TestGridsAndWeights:
    def test_grid_2d_flatten_reference_example(self):
        out = grid_2d_flatten((0, 2), (0, 2), grid_res=1)
        np.testing.assert_array_equal(out, [[0.5, 0.5], [1.5, 0.5], [0.5, 1.5], [1.5, 1.5]])

    def test_get_weighted_values(self):
        df = pd.DataFrame(
            {"rx": [0.0, 0.0, 1.0], "dx": [0.0, 1.0, 1.0], "v": [2.0, 4.0, 6.0]}
        )
        out = get_weighted_values(df, "rx", "dx", "v", lengthscale=1.0)
        # ref 0: weights exp(0)=1 and exp(-0.5); ref 1: single point
        w = np.exp(-0.5)
        np.testing.assert_allclose(out["v"].values, [(2 + 4 * w) / (1 + w), 6.0])

    def test_metrics(self):
        assert rmse([1, 2, 3], [1, 2, 5]) == pytest.approx(np.sqrt(4 / 3))
        assert nll([0.0], [0.0], [1.0]) == pytest.approx(0.5 * np.log(2 * np.pi))

    def test_guess_track_num(self):
        x = np.array([0.0, 0.1, 0.2, 5.0, 5.1, 10.0])
        np.testing.assert_array_equal(guess_track_num(x, thresh=1.0), [0, 0, 0, 1, 1, 2])


class TestExpertLocations:
    def test_sparse_true_array(self):
        m = sparse_true_array((6, 6), grid_space=3)
        assert m.sum() == 4
        assert m[0, 0] and m[0, 3] and m[3, 0] and m[3, 3]

    def test_generate_with_masks(self):
        ref = pd.DataFrame(
            {
                "x": np.repeat([0.0, 1.0, 2.0], 3),
                "y": np.tile([0.0, 1.0, 2.0], 3),
                "obs": [1.0, np.nan, 1.0, np.nan, np.nan, 1.0, 1.0, 1.0, np.nan],
            }
        )
        masks = get_masks_for_expert_loc(ref, el_masks=["had_obs"], obs_col="obs", dims=["x", "y"])
        locs = generate_local_expert_locations({"x": [0.0, 1.0, 2.0], "y": [0.0, 1.0, 2.0]}, masks=masks)
        # only cells with non-nan obs survive
        assert len(locs) == 5
        assert {"x", "y"} == set(locs.columns)

    def test_grid_space_mask(self):
        ref = pd.DataFrame({"x": np.arange(10.0), "y": np.arange(10.0)})
        masks = get_masks_for_expert_loc(ref, el_masks=[{"grid_space": 2, "dims": ["x", "y"]}])
        locs = generate_local_expert_locations({"x": "x", "y": "y"}, ref_data=ref, masks=masks)
        assert len(locs) == 25  # every 2nd of 10 -> 5 per dim


class TestXval:
    def test_expand_by_track(self):
        obs = pd.DataFrame(
            {
                "x": np.arange(12, dtype=float),
                "z": np.ones(12),
                "track": np.repeat([0, 1, 2], 4),
            }
        )
        ref_config = {
            "data": {"data_source": obs, "obs_col": "z", "coords_col": ["x"]},
            "locations": {"source": pd.DataFrame({"x": [5.0]})},
            "model": {"oi_model": "GPflowGPRModel"},
            "run_kwargs": {"store_path": "out.h5"},
        }
        xval_config = {
            "pred_loc": {"method": "from_source"},
            "row_select_values": ["track"],
            "func": "lambda track: track == {track}",
            "col_args": ["track"],
            "output_file": "xval_out.h5",
        }
        xc = XvalConfig(ref_config=ref_config, xval_config=xval_config)
        oic = xc.make_xval_oi_configs(verbose=False)
        assert len(oic) == 3  # one per track
        c0 = oic[0]
        # training data excludes the hold-out track (negated row_select)
        rs = c0["data"]["row_select"][-1]
        assert rs["negate"] is True and "track == 0" in rs["func"]
        # prediction locations select the hold-out track
        prs = c0["pred_loc"]["load_kwargs"]["row_select"][-1]
        assert "track == 0" in prs["func"] and "negate" not in prs
        assert c0["run_kwargs"]["store_path"] == "xval_out.h5"
        assert c0["run_kwargs"]["table_suffix"] == "_0"


class TestXvalEvaluate:
    def test_full_xval_workflow(self, tmp_path):
        """Expand -> run per hold-out -> score held-out predictions
        (ref: examples/Archive/evaluate_xval_performance.py flow)."""
        from gpsat_tpu.local_expert_oi import run_from_config
        from gpsat_tpu.xval import evaluate_xval_results

        rng = np.random.default_rng(0)
        n_per = 80
        rows = []
        for track in range(2):
            x = rng.uniform(-3, 3, n_per)
            y = rng.uniform(-3, 3, n_per)
            rows.append(
                pd.DataFrame(
                    {"x": x, "y": y, "track": track,
                     "z": np.sin(x) * np.cos(y) + 0.05 * rng.normal(size=n_per)}
                )
            )
        obs = pd.concat(rows, ignore_index=True)
        out = str(tmp_path / "xval.h5")
        ref_config = {
            "data": {"data_source": obs, "obs_col": "z", "coords_col": ["x", "y"],
                     "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}]},
            "locations": {"source": pd.DataFrame({"x": [0.0], "y": [0.0]})},
            "model": {"oi_model": "GPflowGPRModel",
                      "optim_kwargs": {"max_iter": 150, "linesearch": "single_eval"}},
            "run_kwargs": {"store_path": out, "min_obs": 5},
        }
        xval_config = {
            "pred_loc": {"method": "from_source"},
            "row_select_values": ["track"],
            "func": "lambda track: track == {track}",
            "col_args": ["track"],
            "output_file": out,
        }
        oic = XvalConfig(ref_config=ref_config, xval_config=xval_config).make_xval_oi_configs(
            verbose=False
        )
        assert len(oic) == 2
        for cfg in oic:
            run_from_config(cfg)
        truth = obs.rename(columns={"x": "pred_loc_x", "y": "pred_loc_y"})
        scores = evaluate_xval_results(out, truth, "z", inference_radius=4.0, join_round=9)
        per = scores[scores.table != "MEAN"]
        assert len(per) == 2 and (per["n"] == n_per).all()
        assert (per["rmse"] < 0.2).all()  # noise floor 0.05
        assert np.isfinite(per["nll"]).all()


class TestCompilationCache:
    def test_enable_respects_user_config_and_optout(self, monkeypatch, tmp_path):
        import jax

        from gpsat_tpu import enable_compilation_cache

        # opt-out wins
        monkeypatch.setenv("GPSAT_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache() is None
        monkeypatch.delenv("GPSAT_NO_COMPILE_CACHE")

        # user-configured dir is respected, not overwritten
        prev = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", str(tmp_path / "user"))
            assert enable_compilation_cache() == str(tmp_path / "user")
            # fresh default goes to GPSAT_CACHE_DIR
            jax.config.update("jax_compilation_cache_dir", None)
            monkeypatch.setenv("GPSAT_CACHE_DIR", str(tmp_path / "auto"))
            out = enable_compilation_cache()
            assert out == str(tmp_path / "auto")
            assert (tmp_path / "auto").is_dir()
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)


class TestTableMarshalling:
    def test_array_to_dataframe_roundtrip(self):
        from gpsat_tpu.utils import array_to_dataframe, dataframe_to_array

        x = np.arange(12).reshape(3, 4)
        df = array_to_dataframe(x, "data")
        np.testing.assert_array_equal(dataframe_to_array(df, "data"), x)
        df2 = array_to_dataframe(x, "data", reset_index=True)
        np.testing.assert_array_equal(
            dataframe_to_array(df2, "data", idx_col=["_dim_0", "_dim_1"]), x
        )

    def test_reference_doc_example(self):
        from gpsat_tpu.utils import array_to_dataframe

        x = np.array([[1, 2], [3, 4]])
        df = array_to_dataframe(x, "data")
        assert df.loc[(1, 0), "data"] == 3

    def test_dict_of_array_concat(self):
        from gpsat_tpu.utils import dict_of_array_to_dict_of_dataframe

        d = {"a": np.array([1, 2, 3]), "b": np.array([[1, 2], [3, 4]]), "c": np.array([1.1, 2.2, 3.3])}
        out = dict_of_array_to_dict_of_dataframe(d, concat=True)
        assert set(out) == {1, 2}
        assert list(out[1].columns) == ["a", "c"]

    def test_make_multiindex_and_readback(self):
        from gpsat_tpu.utils import make_multiindex_df, mindex_df_to_dataarray

        tabs = make_multiindex_df({"x": 1.0, "y": 2.0}, lengthscales=np.array([0.5, 1.5]))
        df = tabs["lengthscales"].reset_index().set_index(["x", "y"])
        vals, locs = mindex_df_to_dataarray(df, "lengthscales")
        np.testing.assert_array_equal(vals, [[0.5, 1.5]])

    def test_dataframe_to_2d_array(self):
        from gpsat_tpu.utils import dataframe_to_2d_array

        df = pd.DataFrame({"x": [0, 1, 0, 1], "y": [0, 0, 1, 1], "v": [1.0, 2.0, 3.0, 4.0]})
        arr, xs, ys = dataframe_to_2d_array(df, "x", "y", "v")
        np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])

    def test_pip_freeze(self):
        from gpsat_tpu.utils import pip_freeze_to_dataframe

        df = pip_freeze_to_dataframe()
        assert "jax" in set(df["package"].str.lower())


def test_get_weighted_values_drops_nan_keys():
    # pivot_table dropna semantics: rows with NaN reference coords vanish
    df = pd.DataFrame(
        {"rx": [0.0, np.nan, 1.0], "dx": [0.0, 0.5, 1.0], "v": [2.0, 9.0, 6.0]}
    )
    out = get_weighted_values(df, "rx", "dx", "v", lengthscale=1.0)
    assert len(out) == 2
    assert not out["rx"].isna().any()
    np.testing.assert_allclose(out["v"].values, [2.0, 6.0])


class TestReferenceCompatSurface:
    """Reference-placement aliases (migration surface; ref: GPSat/utils.py,
    GPSat/__init__.py, bin_data.py:853, postprocessing.py:580)."""

    def test_sigmoid_round_trip_and_saturation(self):
        import numpy as np
        from gpsat_tpu.utils import inverse_sigmoid, sigmoid

        x = np.linspace(-4, 4, 9)
        np.testing.assert_allclose(inverse_sigmoid(sigmoid(x, 1, 3), 1, 3), x, atol=1e-10)
        assert inverse_sigmoid(1.0, 1, 3) == -np.inf
        assert inverse_sigmoid(3.0, 1, 3) == np.inf
        np.testing.assert_allclose(sigmoid(0.0), 0.5)

    def test_utils_lazy_aliases_resolve(self):
        import gpsat_tpu.utils as U

        for name in ["sparse_true_array", "get_previous_oi_config",
                     "check_prev_oi_config", "get_git_information",
                     "glue_local_predictions", "bin_obs_by_date", "log_lines",
                     "not_nan", "softplus", "inverse_softplus", "json_load",
                     "expand_dict_by_vals", "get_col_values", "diff_distance",
                     "assign_category_col", "convert_lon_lat_str",
                     "move_to_archive", "pretty_print_class"]:
            assert callable(getattr(U, name)), name
        import pytest

        with pytest.raises(AttributeError):
            U.definitely_not_a_symbol

    def test_package_path_helpers(self):
        import os

        import gpsat_tpu as g

        assert g.get_path().endswith("gpsat_tpu")
        assert os.path.isdir(g.get_config_path())
        assert g.get_config_path("x.json").endswith(os.path.join("configs", "x.json"))

    def test_update_attr_copies(self):
        from gpsat_tpu.read_and_store import update_attr

        d = {"a": 1}
        out = update_attr(d, "b", 2)
        assert out == {"a": 1, "b": 2} and d == {"a": 1}

    def test_pure_python_reference_wrappers(self):
        import numpy as np
        from gpsat_tpu.models.pure_python_gpr import GPR, SGPkernel, SMLII_mod
        from gpsat_tpu.models.pure_numpy_gpr import gpr_predict, neg_lml, sgp_kernel

        rng = np.random.default_rng(0)
        x = rng.uniform(size=(15, 2))
        y = np.sin(3 * x[:, 0])
        ell = np.array([0.7, 1.1])
        np.testing.assert_allclose(SGPkernel(x, ell=ell, sigma=1.3),
                                   sgp_kernel(x, ell=ell, sigma=1.3))
        h = np.array([0.7, 1.1, 1.3, 0.05])
        v1, g1 = SMLII_mod(h, x, y, use_log=True)
        v2, g2 = neg_lml(h, x, y)
        np.testing.assert_allclose(v1, v2)
        np.testing.assert_allclose(g1, g2)
        fs, sfs, prior = GPR(x, y, x[:4], ell=ell, sf2=1.3, sn2=0.05, mean=0.1,
                             returnprior=True)
        fs2, sfs2 = gpr_predict(x, y, x[:4], ell=ell, sf2=1.3, sn2=0.05, mean=0.1)
        np.testing.assert_allclose(fs, fs2)
        np.testing.assert_allclose(sfs, sfs2)
        np.testing.assert_allclose(prior, np.sqrt(1.3) * np.ones(4), atol=1e-10)

    def test_config_fallback_loaders(self, monkeypatch, tmp_path):
        """get_bin_data_config / get_smooth_params_config fall back to the
        example configs when no sysargv config is given."""
        import sys

        monkeypatch.setattr(sys, "argv", ["prog"])
        import warnings

        from gpsat_tpu.postprocessing import get_smooth_params_config

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg = get_smooth_params_config()
        assert "result_file" in cfg and cfg["result_file"].endswith("ABC_binned_example.h5")
