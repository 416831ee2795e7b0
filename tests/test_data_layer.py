"""Data-layer tests: selection DSL, loading, binning, ingest, prediction
locations. Mirrors the reference's tests/test_dataloader.py and
tests/test_dataprepper.py coverage (SURVEY.md §4)."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data import binning, dataloader as DL, ingest, select as sel
from gpsat_tpu.data.prediction_locations import PredictionLocations, max_dist_bool
from gpsat_tpu.data.store import TableStore

rng = np.random.default_rng(3)


@pytest.fixture()
def sample_df():
    return pd.DataFrame(
        {
            "x": [1.0, 2.0, 3.0, 4.0, 5.0],
            "y": [2.0, 4.0, 6.0, 8.0, 10.0],
            "t": [0.0, 1.0, 2.0, 3.0, 4.0],
            "obs": [0.1, 0.2, 0.3, 0.4, 0.5],
        }
    )


class TestSelectDSL:
    def test_row_select_and(self, sample_df):
        m = sel.row_select_bool(sample_df, [{"col": "x", "comp": ">", "val": 2.0}, {"col": "t", "comp": "<=", "val": 3.0}])
        assert list(m) == [False, False, True, True, False]

    def test_row_select_or_negate(self, sample_df):
        m = sel.row_select_bool(
            sample_df,
            [{"col": "x", "comp": "<", "val": 2.0}, {"col": "x", "comp": ">", "val": 4.0}],
            combine="OR",
        )
        assert list(m) == [True, False, False, False, True]
        m2 = sel.row_select_bool(sample_df, [{"col": "x", "comp": "<", "val": 2.0, "negate": True}])
        assert list(m2) == [False, True, True, True, True]

    def test_config_func_row_select(self, sample_df):
        m = sel.row_select_bool(sample_df, [{"func": "lambda x, y: x + y > 5", "col_args": ["x", "y"]}])
        assert list(m) == [False, True, True, True, True]

    def test_local_select_radius_and_window(self, sample_df):
        ref = {"x": 3.0, "y": 6.0, "t": 2.0}
        ls = [
            {"col": ["x", "y"], "comp": "<", "val": 2.5},
            {"col": "t", "comp": "<=", "val": 1.0},
            {"col": "t", "comp": ">=", "val": -1.0},
        ]
        out = sel.local_data_select(sample_df, ref, ls)
        # rows within radius 2.5 of (3,6) and |t-2|<=1
        assert list(out["t"]) == [1.0, 2.0, 3.0]
        # prebuilt kdtree path gives the same result
        trees = sel.build_kdtrees(sample_df, ls)
        out2 = sel.local_data_select(sample_df, ref, ls, kdtree=trees)
        pd.testing.assert_frame_equal(out, out2)

    def test_get_where_list_dynamic(self, sample_df):
        gs = [
            {"col": "x", "comp": ">=", "val": 0.0},
            {"loc_col": "t", "src_col": "date", "func": "lambda x, y: x + y"},
        ]
        ls = [{"col": "t", "comp": "<=", "val": 4.0}, {"col": "t", "comp": ">=", "val": -4.0}]
        out = sel.get_where_list(gs, local_select=ls, ref_loc={"t": 10.0})
        assert out[0] == gs[0]
        assert out[1] == {"col": "date", "comp": "<=", "val": 14.0}
        assert out[2] == {"col": "date", "comp": ">=", "val": 6.0}


class TestLoad:
    def test_load_csv_where_colfuncs(self, sample_df, tmp_path):
        p = str(tmp_path / "d.csv")
        sample_df.to_csv(p, index=False)
        df = DL.load(
            p,
            where=[{"col": "x", "comp": ">", "val": 1.0}],
            col_funcs={"z": {"func": "lambda a, b: a * b", "col_args": ["x", "y"]}},
            row_select=[{"col": "z", "comp": "<", "val": 30.0}],
            col_select=["x", "z"],
        )
        assert list(df.columns) == ["x", "z"]
        assert list(df["z"]) == [8.0, 18.0]

    def test_load_tuple_col_output(self, sample_df):
        df = sample_df.copy()
        DL.add_cols(df, {("a", "b"): {"func": "lambda x: (x + 1, x - 1)", "col_args": ["x"]}})
        assert list(df["a"]) == [2.0, 3.0, 4.0, 5.0, 6.0]
        assert list(df["b"]) == [0.0, 1.0, 2.0, 3.0, 4.0]

    def test_load_parquet(self, sample_df, tmp_path):
        p = str(tmp_path / "d.parquet")
        sample_df.to_parquet(p)
        df = DL.load(p, where=[{"col": "x", "comp": "<=", "val": 2.0}])
        assert len(df) == 2

    def test_load_h5_store(self, sample_df, tmp_path):
        p = str(tmp_path / "d.h5")
        with TableStore(p) as ts:
            ts.append("data", sample_df)
        df = DL.load(p, table="data", where=[{"col": "t", "comp": "==", "val": 2.0}])
        assert len(df) == 1 and df["obs"].iloc[0] == 0.3


class TestBinning:
    def _df(self):
        n = 2000
        x = rng.uniform(0, 10, n)
        y = rng.uniform(0, 10, n)
        t = rng.integers(0, 2, n)
        v = x + y
        return pd.DataFrame({"x": x, "y": y, "date": t, "v": v})

    def test_bin_data_mean_matches_scipy(self):
        df = self._df()
        b, (xc, yc) = binning.bin_data(
            df, x_range=[0, 10], y_range=[0, 10], grid_res=1.0, val_col="v"
        )
        assert b.shape == (10, 10)
        # center of cell (i,j) has mean ~ x+y there
        assert abs(b[0, 0] - (xc[0] + yc[0])) < 0.5

    def test_bin_data_by_multiple_stats(self):
        df = self._df()
        out = binning.bin_data_by(
            df,
            by_cols="date",
            val_col="v",
            x_range=[0, 10],
            y_range=[0, 10],
            grid_res=2.0,
            bin_statistic=["mean", "count"],
        )
        out = out.reset_index()
        assert {"v_mean", "v_count", "x", "y", "date"} <= set(out.columns)
        assert set(out["date"]) == {0, 1}
        assert len(out) == 2 * 25  # 5x5 grid per date value

    def test_bin_data_by_return_xarray(self):
        # divergence #6 closer: reference's bin_data_by returns xr.Dataset
        # (GPSat/dataprepper.py:23-223); optional-import adapter here
        df = self._df()
        kw = dict(
            by_cols="date", val_col="v", x_range=[0, 10], y_range=[0, 10],
            grid_res=2.0, bin_statistic=["mean", "count"],
        )
        try:
            import xarray  # noqa: F401
        except ImportError:
            with pytest.raises(ImportError, match="xarray"):
                binning.bin_data_by(df, return_xarray=True, **kw)
            return
        ds = binning.bin_data_by(df, return_xarray=True, **kw)
        long = binning.bin_data_by(df, **kw)
        assert set(ds.data_vars) == {"v_mean", "v_count"}
        assert set(ds.dims) == {"y", "x", "date"}
        # round-trip: Dataset back to the long frame is identical
        back = ds.to_dataframe().reorder_levels(long.index.names).sort_index()
        pd.testing.assert_frame_equal(back, long.sort_index(), check_like=True)

    def test_bin_pipeline_write(self, tmp_path):
        df = self._df()
        src = str(tmp_path / "raw.h5")
        with TableStore(src) as ts:
            ts.append("data", df)
        out_file = str(tmp_path / "binned.h5")
        bd = binning.BinData()
        df_bin, stats = bd.bin_data(
            input={"source": src, "table": "data"},
            bin_config={"by_cols": "date", "val_col": "v", "x_range": [0, 10], "y_range": [0, 10], "grid_res": 2.0},
            output={"file": out_file, "table": "data"},
        )
        assert df_bin is not None and len(df_bin) > 0
        with TableStore(out_file, mode="r") as ts:
            stored = ts.select("data", set_index=False)
            assert len(stored) == len(df_bin)
            attrs = ts.get_attrs("data")
            assert "bin_config" in attrs and "run_info" in attrs

    def test_batch_matches_all_at_once(self, tmp_path):
        df = self._df()
        src = str(tmp_path / "raw.h5")
        with TableStore(src) as ts:
            ts.append("data", df)
        bd = binning.BinData()
        cfg = {"by_cols": "date", "val_col": "v", "x_range": [0, 10], "y_range": [0, 10], "grid_res": 2.0}
        a, _ = bd.bin_data_all_at_once(source=src, table="data", bin_config=cfg)
        b, _ = bd.bin_data_by_batch(source=src, table="data", load_by="date", bin_config=cfg)
        a = a.sort_values(["date", "y", "x"]).reset_index(drop=True)
        b = b.sort_values(["date", "y", "x"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns])


class TestIngest:
    def test_read_and_store_resumable(self, tmp_path):
        # two directories of csv files -> one table with a batch ledger
        for d, lo in [("a", 0), ("b", 100)]:
            (tmp_path / d).mkdir()
            for i in range(2):
                pd.DataFrame({"x": [lo + i, lo + i + 1], "v": [1.0, 2.0]}).to_csv(
                    tmp_path / d / f"obs_{i}.csv", index=False
                )
        out_file = str(tmp_path / "store.h5")
        output = {"file": out_file, "table": "data"}
        ingest.read_and_store(output, file_dirs=str(tmp_path), sub_dirs=["a", "b"], file_regex=r"obs_\d+\.csv")
        with TableStore(out_file, mode="r") as ts:
            n1 = len(ts.select("data", set_index=False))
            assert n1 == 8
            assert len(ts.select("_data_batches", set_index=False)) == 2

        # rerun: nothing new ingested
        ingest.read_and_store(output, file_dirs=str(tmp_path), sub_dirs=["a", "b"], file_regex=r"obs_\d+\.csv")
        with TableStore(out_file, mode="r") as ts:
            assert len(ts.select("data", set_index=False)) == n1

        # different config -> hard error, not silent append
        with pytest.raises(ValueError, match="different config"):
            ingest.read_and_store(output, file_dirs=str(tmp_path), sub_dirs=["a"], file_regex=r".*\.csv")


class TestPredictionLocations:
    def test_expert_loc_and_shift(self):
        pl = PredictionLocations(method="expert_loc", coords_col=["x", "y"], expert_loc=[1.0, 2.0])
        np.testing.assert_array_equal(pl(), [[1.0, 2.0]])
        pl2 = PredictionLocations(
            method="shift_arrays", coords_col=["x", "y"], expert_loc=[1.0, 2.0], x=np.array([-1.0, 0.0, 1.0])
        )
        out = pl2()
        assert out.shape == (3, 2)
        np.testing.assert_array_equal(out[:, 0], [0.0, 1.0, 2.0])
        np.testing.assert_array_equal(out[:, 1], [2.0, 2.0, 2.0])

    def test_from_dataframe_max_dist(self):
        grid = pd.DataFrame({"x": np.arange(10, dtype=float), "y": np.zeros(10)})
        pl = PredictionLocations(
            method="from_dataframe", coords_col=["x", "y", "t"], expert_loc=[5.0, 0.0, 7.0], df=grid, max_dist=2.5
        )
        out = pl()
        # points within 2.5 of x=5: 3..7; missing 't' filled from expert
        np.testing.assert_array_equal(out[:, 0], [3.0, 4.0, 5.0, 6.0, 7.0])
        np.testing.assert_array_equal(out[:, 2], np.full(5, 7.0))

    def test_max_dist_bool_matches_cdist(self):
        locs = rng.normal(size=(500, 3))
        ref = np.array([0.1, -0.2, 0.3])
        from scipy.spatial.distance import cdist

        expect = cdist(locs, ref[None, :])[:, 0] < 1.1
        np.testing.assert_array_equal(max_dist_bool(locs, ref, 1.1), expect)


class TestDataLoaderFacade:
    def test_reference_surface(self, sample_df, tmp_path):
        from gpsat_tpu.dataloader import DataLoader, DataPrep

        # load + select through the facade
        p = str(tmp_path / "d.csv")
        sample_df.to_csv(p, index=False)
        df = DataLoader.load(p, where=[{"col": "x", "comp": ">", "val": 2.0}])
        assert len(df) == 3

        # store helpers
        h5 = str(tmp_path / "s.h5")
        DataLoader.write_to_hdf(sample_df, h5, "data")
        assert DataLoader.get_keys(h5) == ["data"]
        out = DataLoader.read_hdf(h5, "data", where="x >= 3")
        assert len(out) == 3

        # binning facade
        binned, _ = DataPrep.bin_data(
            sample_df.assign(v=1.0), x_range=[0, 6], y_range=[0, 12], grid_res=2.0, val_col="v"
        ), None
        # attribute round trip
        with DataLoader.connect_to_hdf_store(h5) as s:
            s.put_attrs("data", bin_config={"grid_res": 2.0})
        assert DataLoader.get_attribute_from_table(h5, "data", "bin_config") == {"grid_res": 2.0}


def test_local_select_indices_all_matches_per_expert():
    """Batched all-experts local select (grid-hash / vectorized) returns
    exactly the per-expert local_select_bool index sets, for euclidean +
    scalar + secondary-euclidean combinations."""
    import numpy as np
    import pandas as pd

    from gpsat_tpu.data import select as sel

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "x": rng.uniform(0, 10, n),
        "y": rng.uniform(0, 10, n),
        "z": rng.uniform(0, 10, n),
        "t": rng.integers(0, 5, n).astype(float),
    })
    refs = pd.DataFrame({
        "x": [2.0, 5.0, 8.0], "y": [3.0, 5.0, 7.0], "z": [5.0, 5.0, 5.0],
        "t": [2.0, 2.0, 3.0],
    })
    cases = [
        [{"col": ["x", "y"], "comp": "<", "val": 2.5}],
        [{"col": ["x", "y"], "comp": "<", "val": 2.5},
         {"col": "t", "comp": "<=", "val": 1.0},
         {"col": "t", "comp": ">=", "val": -1.0}],
        [{"col": ["x", "y"], "comp": "<", "val": 3.0},
         {"col": ["x", "y", "z"], "comp": "<=", "val": 2.8}],
        [{"col": "t", "comp": "<=", "val": 0.0}],  # no euclidean entry
        [{"col": ["x", "y", "z"], "comp": "<", "val": 2.0}],  # 3-d first entry
    ]
    for local_select in cases:
        batched = sel.local_select_indices_all(df, refs, local_select)
        for e in range(len(refs)):
            gold = np.flatnonzero(sel.local_select_bool(df, refs.iloc[[e]], local_select))
            np.testing.assert_array_equal(batched[e], gold, err_msg=f"{local_select} expert {e}")


class TestZarrEngine:
    """Built-in zarr v2 reader (stdlib codecs) — engine gate removed
    (ref: GPSat/dataloader.py:60-66, 1239-1254)."""

    def _write_store(self, path):
        import numpy as np

        from gpsat_tpu.data.zarr_reader import write_zarr

        rng = np.random.default_rng(0)
        lon = np.linspace(-30.0, 30.0, 5)
        lat = np.linspace(60.0, 80.0, 4)
        z = rng.normal(size=(4, 5))
        elev = rng.normal(size=(4, 5)).astype(np.float32)
        write_zarr(
            str(path),
            data_vars={"z": (("lat", "lon"), z), "elev": (("lat", "lon"), elev)},
            coords={"lon": lon, "lat": lat},
        )
        return lon, lat, z, elev

    def test_round_trip(self, tmp_path):
        import numpy as np

        from gpsat_tpu.data.zarr_reader import read_zarr

        store = tmp_path / "obs.zarr"
        lon, lat, z, elev = self._write_store(store)
        df = read_zarr(str(store))
        assert df.index.names == ["lat", "lon"]
        assert len(df) == 20
        np.testing.assert_allclose(
            df["z"].values.reshape(4, 5), z, rtol=0
        )
        np.testing.assert_allclose(df["elev"].values.reshape(4, 5), elev, rtol=0)

    def test_loader_engine_and_where(self, tmp_path):
        import numpy as np

        from gpsat_tpu.data import dataloader as DL

        store = tmp_path / "obs.zarr"
        lon, lat, z, _ = self._write_store(store)
        df = DL.load(str(store), where=[{"col": "lat", "comp": ">=", "val": 70.0}])
        assert set(df.columns) >= {"lat", "lon", "z", "elev"}
        assert (df["lat"] >= 70.0).all()
        assert len(df) == 2 * 5

    def test_uncompressed_and_missing_chunks(self, tmp_path):
        import os

        import numpy as np

        from gpsat_tpu.data.zarr_reader import read_zarr_array, write_zarr_array

        d = tmp_path / "arr"
        vals = np.arange(10.0).reshape(2, 5)
        write_zarr_array(str(d), vals, ("a", "b"), chunks=(1, 3), compress=False)
        out, attrs = read_zarr_array(str(d))
        np.testing.assert_array_equal(out, vals)
        assert attrs["_ARRAY_DIMENSIONS"] == ["a", "b"]
        # removing a chunk file -> fill value (0) in that region
        os.remove(str(d / "0.0"))
        out2, _ = read_zarr_array(str(d))
        assert (out2[0, :3] == 0).all() and (out2[1] == vals[1]).all()


def test_pred_loc_batch_call_matches_per_expert():
    """batch_call == per-expert __call__ for every method, including the
    grid-hash-batched from_dataframe+max_dist hot path."""
    import numpy as np
    import pandas as pd

    from gpsat_tpu.data.prediction_locations import PredictionLocations

    rng = np.random.default_rng(5)
    grid = pd.DataFrame({"x": rng.uniform(0, 10, 3000), "y": rng.uniform(0, 10, 3000)})
    experts = pd.DataFrame({"x": [2.0, 5.0, 8.0], "y": [3.0, 5.0, 7.0], "t": [1.0, 2.0, 3.0]})

    cases = [
        dict(method="from_dataframe", coords_col=["x", "y"], df=grid, max_dist=2.0),
        # missing coord column filled from the expert location
        dict(method="from_dataframe", coords_col=["x", "y", "t"], df=grid, max_dist=2.0),
        dict(method="expert_loc", coords_col=["x", "y"]),
        dict(method="shift_arrays", coords_col=["x", "y"], x=np.array([-0.5, 0.0, 0.5])),
    ]
    for kw in cases:
        pl = PredictionLocations(**kw)
        batched = pl.batch_call(experts)
        pl2 = PredictionLocations(**{k: v for k, v in kw.items()})
        for e in range(len(experts)):
            pl2.expert_loc = experts.iloc[[e]]
            gold = pl2()
            np.testing.assert_array_equal(batched[e], gold, err_msg=f"{kw['method']} expert {e}")


def test_pred_loc_batch_call_from_source_and_dtypes(tmp_path, monkeypatch):
    """from_source resolves once up front and then takes the batched
    grid-hash path; non-f64 grids fall back to the per-expert path (whose
    expert-loc-to-grid-dtype cast the batched query cannot reproduce) and
    still match it exactly."""
    import numpy as np
    import pandas as pd

    from gpsat_tpu import native
    from gpsat_tpu.data.prediction_locations import PredictionLocations

    rng = np.random.default_rng(7)
    grid = pd.DataFrame({"x": rng.uniform(0, 10, 2000), "y": rng.uniform(0, 10, 2000)})
    csv = tmp_path / "grid.csv"
    grid.to_csv(csv, index=False)
    experts = pd.DataFrame({"x": [2.0, 5.0], "y": [3.0, 5.0]})

    calls = {"n": 0}
    real = native.radius_query_all

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(native, "radius_query_all", counting)

    pl = PredictionLocations(
        method="from_source", coords_col=["x", "y"],
        load_kwargs={"source": str(csv)}, max_dist=2.0,
    )
    batched = pl.batch_call(experts)
    assert calls["n"] == 1, "from_source should resolve then batch via the grid hash"
    # gold: per-expert path on the SAME from_source config (CSV text
    # round-trip perturbs last-ulp values, so compare like with like)
    gold_pl = PredictionLocations(
        method="from_source", coords_col=["x", "y"],
        load_kwargs={"source": str(csv)}, max_dist=2.0,
    )
    for e in range(len(experts)):
        gold_pl.expert_loc = experts.iloc[[e]]
        np.testing.assert_array_equal(batched[e], gold_pl())

    # int grid: expert (2.6, 3.4) truncates to (2, 3) in the per-expert
    # path — batch_call must fall back and agree with it
    int_grid = pd.DataFrame({
        "x": rng.integers(0, 10, 2000), "y": rng.integers(0, 10, 2000)
    })
    experts_frac = pd.DataFrame({"x": [2.6], "y": [3.4]})
    calls["n"] = 0
    pl_int = PredictionLocations(
        method="from_dataframe", coords_col=["x", "y"], df=int_grid, max_dist=2.0
    )
    batched_int = pl_int.batch_call(experts_frac)
    assert calls["n"] == 0, "non-f64 grid must not take the batched path"
    per = PredictionLocations(
        method="from_dataframe", coords_col=["x", "y"], df=int_grid, max_dist=2.0
    )
    per.expert_loc = experts_frac.iloc[[0]]
    np.testing.assert_array_equal(batched_int[0], per())

    # f32 grid likewise falls back and matches
    f32_grid = grid.astype(np.float32)
    pl32 = PredictionLocations(
        method="from_dataframe", coords_col=["x", "y"], df=f32_grid, max_dist=2.0
    )
    batched32 = pl32.batch_call(experts)
    assert calls["n"] == 0
    per32 = PredictionLocations(
        method="from_dataframe", coords_col=["x", "y"], df=f32_grid, max_dist=2.0
    )
    for e in range(len(experts)):
        per32.expert_loc = experts.iloc[[e]]
        np.testing.assert_array_equal(batched32[e], per32())


def test_readers_return_requested_coordinate_variables(tmp_path):
    """variables=[...] including a coordinate array that no selected data
    var covers must return it as an index level (xarray to_dataframe
    semantics), not silently drop it — for both the zarr and netcdf
    readers."""
    import numpy as np

    from gpsat_tpu.data.zarr_reader import read_zarr, write_zarr

    store = str(tmp_path / "s.zarr")
    write_zarr(
        store,
        {"obs": (("t",), np.array([1.0, 2.0, 3.0]))},
        coords={"t": np.array([10.0, 20.0, 30.0]),
                "lat": np.array([55.0, 56.0])},
    )
    out = read_zarr(store, variables=["lat", "obs"])
    flat = out.reset_index()
    assert "lat" in flat.columns and "obs" in flat.columns
    assert sorted(set(flat["lat"].dropna())) == [55.0, 56.0]
    # coord alone
    only = read_zarr(store, variables=["lat"]).reset_index()
    assert sorted(only["lat"]) == [55.0, 56.0]
    # coord covered by a data var: present as index level, not duplicated
    cov = read_zarr(store, variables=["obs"])
    assert cov.index.name == "t" and list(cov.columns) == ["obs"]

    # netcdf reader: same contract
    import h5py

    from gpsat_tpu.data.netcdf import read_netcdf

    nc = str(tmp_path / "s.nc")
    with h5py.File(nc, "w") as f:
        t = f.create_dataset("t", data=np.array([10.0, 20.0, 30.0]))
        t.make_scale("t")
        lat = f.create_dataset("lat", data=np.array([55.0, 56.0]))
        lat.make_scale("lat")
        d = f.create_dataset("obs", data=np.array([1.0, 2.0, 3.0]))
        d.dims[0].attach_scale(t)
    out = read_netcdf(nc, variables=["lat", "obs"]).reset_index()
    assert "lat" in out.columns and "obs" in out.columns
    assert sorted(set(out["lat"].dropna())) == [55.0, 56.0]
    only = read_netcdf(nc, variables=["lat"]).reset_index()
    assert sorted(only["lat"]) == [55.0, 56.0]


def test_zarr_zstd_codec(tmp_path):
    """numcodecs-style zstd-compressed chunks decode (zstandard is in the
    image; frames without a content-size header included)."""
    import numpy as np
    import zstandard

    from gpsat_tpu.data.zarr_reader import read_zarr, read_zarr_array, write_zarr

    store = str(tmp_path / "z.zarr")
    vals = np.arange(12.0).reshape(3, 4)
    write_zarr(store, {"z": (("a", "b"), vals)},
               coords={"a": np.arange(3.0), "b": np.arange(4.0)},
               compress="zstd")
    out, _ = read_zarr_array(str(tmp_path / "z.zarr" / "z"))
    np.testing.assert_array_equal(out, vals)
    df = read_zarr(store)
    assert len(df) == 12

    # streamed frame with no content size in the header (numcodecs'
    # stream_writer path) must also decode
    import json, os
    chunk_file = os.path.join(store, "a", "0")
    raw = zstandard.ZstdDecompressor().decompress(
        open(chunk_file, "rb").read(), max_output_size=1 << 20)
    cctx = zstandard.ZstdCompressor(level=1)
    import io
    buf = io.BytesIO()
    with cctx.stream_writer(buf, closefd=False) as w:
        w.write(raw)
    open(chunk_file, "wb").write(buf.getvalue())
    out2, _ = read_zarr_array(os.path.join(store, "a"))
    np.testing.assert_array_equal(out2, np.arange(3.0))
