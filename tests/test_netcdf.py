"""h5py-based netCDF4 reader: to_dataframe contract + CF decoding.

The reference ingests ESA netCDF files via xr.open_dataset(...).to_dataframe()
(ref: GPSat/dataloader.py:60-66, 388-394, 1294-1414); this build reads the
same files (netCDF4 == HDF5 + dimension scales) through h5py.
"""

import os

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.netcdf import read_netcdf, write_netcdf


@pytest.fixture()
def track_nc(tmp_path):
    """1-D satellite-track-style file: time dim + CF time units, fill
    values, scale/offset packing."""
    import h5py

    path = os.path.join(tmp_path, "track.nc")
    n = 50
    rng = np.random.default_rng(0)
    t = np.arange(n, dtype=np.float64) * 10.0  # seconds since epoch
    lat = rng.uniform(60, 80, n)
    lon = rng.uniform(-180, 180, n)
    fb = rng.normal(0.2, 0.05, n)
    fb_packed = np.round((fb - 0.0) / 1e-4).astype(np.int32)
    fb_packed[3] = -9999  # fill
    with h5py.File(path, "w") as f:
        dt = f.create_dataset("time", data=t)
        dt.make_scale("time")
        dt.attrs["units"] = b"seconds since 2020-03-01 00:00:00"
        dt.attrs["calendar"] = b"standard"
        for name, vals in [("lat", lat), ("lon", lon)]:
            ds = f.create_dataset(name, data=vals)
            ds.dims[0].attach_scale(dt)
        ds = f.create_dataset("freeboard", data=fb_packed)
        ds.dims[0].attach_scale(dt)
        ds.attrs["_FillValue"] = np.int32(-9999)
        ds.attrs["scale_factor"] = np.float64(1e-4)
        ds.attrs["add_offset"] = np.float64(0.0)
    return path, dict(t=t, lat=lat, lon=lon, fb=fb)


class TestReadNetcdf:
    def test_track_file_cf_decode(self, track_nc):
        path, ref = track_nc
        df = read_netcdf(path)
        assert set(df.columns) == {"lat", "lon", "freeboard"}
        assert df.index.name == "time"
        # CF time decode
        assert df.index[0] == pd.Timestamp("2020-03-01 00:00:00")
        assert df.index[1] == pd.Timestamp("2020-03-01 00:00:10")
        np.testing.assert_allclose(df["lat"].values, ref["lat"])
        # packed variable: scale/offset applied, fill -> NaN
        fb = df["freeboard"].values
        assert np.isnan(fb[3])
        ok = np.ones(len(fb), bool)
        ok[3] = False
        np.testing.assert_allclose(fb[ok], ref["fb"][ok], atol=1e-4)

    def test_variable_subset(self, track_nc):
        path, _ = track_nc
        df = read_netcdf(path, variables=["lat"])
        assert list(df.columns) == ["lat"]
        with pytest.raises(KeyError):
            read_netcdf(path, variables=["nope"])

    def test_2d_and_broadcast(self, tmp_path):
        # gridded variable over (y, x) plus a 1-D variable over y only:
        # the 1-D variable broadcasts over the full product (to_dataframe
        # semantics)
        path = os.path.join(tmp_path, "grid.nc")
        y = np.array([0.0, 1.0, 2.0])
        x = np.array([10.0, 20.0])
        z = np.arange(6, dtype=float).reshape(3, 2)
        write_netcdf(path, {"z": (("y", "x"), z), "rowsum": ("y", z.sum(axis=1))},
                     coords={"y": y, "x": x})
        df = read_netcdf(path)
        assert df.index.names == ["y", "x"]
        assert len(df) == 6
        np.testing.assert_allclose(df["z"].values, z.reshape(-1))
        np.testing.assert_allclose(
            df["rowsum"].values, np.repeat(z.sum(axis=1), 2)
        )
        # selecting one cell by index
        assert float(df.loc[(1.0, 20.0), "z"]) == z[1, 1]

    def test_dim_without_coordinate_variable(self, tmp_path):
        import h5py

        path = os.path.join(tmp_path, "nocoord.nc")
        with h5py.File(path, "w") as f:
            # netCDF4-style dimension with no values (phony NAME)
            d = f.create_dataset("obs", data=np.zeros(4))
            d.make_scale("obs")
            d.attrs["NAME"] = (
                b"This is a netCDF dimension but not a netCDF variable.         4"
            )
            v = f.create_dataset("v", data=np.array([5.0, 6.0, 7.0, 8.0]))
            v.dims[0].attach_scale(d)
        df = read_netcdf(path)
        np.testing.assert_array_equal(df.index.values, np.arange(4))
        np.testing.assert_allclose(df["v"].values, [5, 6, 7, 8])

    def test_multiindex_writer_preserves_dtypes(self, tmp_path):
        """MultiIndex write_netcdf round-trips datetime levels and
        datetime/string/int payload columns instead of coercing everything
        to float NaN arrays (regression: round-3 review finding)."""
        path = os.path.join(tmp_path, "mi.nc")
        dates = pd.to_datetime(["2020-03-01", "2020-03-02"])
        lats = np.array([70.0, 75.0])
        idx = pd.MultiIndex.from_product([dates, lats], names=["date", "lat"])
        df = pd.DataFrame(
            {
                "fb": [0.1, 0.2, 0.3, 0.4],
                "count": np.array([3, 1, 4, 1], dtype=np.int64),
                "src": ["A", "B", "A", "C"],
                "t_obs": pd.to_datetime(
                    ["2020-03-01T01", "2020-03-01T02", "2020-03-02T01", "2020-03-02T02"]
                ),
            },
            index=idx,
        )
        write_netcdf(path, df)
        out = read_netcdf(path)
        assert list(out.index.names) == ["date", "lat"]
        np.testing.assert_array_equal(
            out.index.get_level_values("date").unique().values, dates.values
        )
        np.testing.assert_allclose(out["fb"].values, df["fb"].values)
        # dense int column keeps integer dtype; strings and datetimes round-trip
        assert np.issubdtype(out["count"].dtype, np.integer)
        np.testing.assert_array_equal(out["count"].values, df["count"].values)
        assert list(out["src"].values) == list(df["src"].values)
        np.testing.assert_array_equal(out["t_obs"].values, df["t_obs"].values)

    def test_multiindex_writer_sparse_cells(self, tmp_path):
        """Missing cells of the dense dim product fill with the column
        dtype's own null (NaN / NaT / None)."""
        path = os.path.join(tmp_path, "sparse.nc")
        idx = pd.MultiIndex.from_tuples(
            [(1, 10.0), (2, 20.0)], names=["a", "b"]
        )  # product has 4 cells, 2 filled
        df = pd.DataFrame(
            {"v": [1.5, 2.5], "t": pd.to_datetime(["2021-01-01", "2021-01-02"]),
             "n": np.array([7, 9], dtype=np.int64)},
            index=idx,
        )
        write_netcdf(path, df)
        out = read_netcdf(path)
        assert len(out) == 4
        assert out["v"].isna().sum() == 2
        assert out["t"].isna().sum() == 2
        # sparse int promotes to float NaN (xarray convention)
        assert out["n"].isna().sum() == 2

    def test_groups_rejected(self, tmp_path):
        import h5py

        path = os.path.join(tmp_path, "grouped.nc")
        with h5py.File(path, "w") as f:
            f.create_group("sub")
        with pytest.raises(NotImplementedError, match="group"):
            read_netcdf(path)


class TestLoadAndIngestNc:
    def test_load_with_where_and_col_funcs(self, track_nc):
        from gpsat_tpu.data import dataloader

        path, ref = track_nc
        df = dataloader.load(
            path,
            where=[{"col": "lat", "comp": ">=", "val": 70.0}],
            col_funcs={"lat2": {"func": "lambda lat: lat * 2", "col_args": "lat"}},
        )
        assert (df["lat"] >= 70.0).all()
        np.testing.assert_allclose(df["lat2"].values, df["lat"].values * 2)
        # time survives as a column after reset_index
        assert "time" in df.columns

    def test_read_from_multiple_files_nc(self, track_nc, tmp_path):
        from gpsat_tpu.data.ingest import read_from_multiple_files

        path, ref = track_nc
        d = os.path.dirname(path)
        out = read_from_multiple_files(
            d, r"\.nc$", read_engine="nc",
            row_select=[{"col": "lat", "comp": ">", "val": 65.0}],
            col_select=["time", "lat", "lon", "freeboard"],
        )
        assert list(out.columns) == ["time", "lat", "lon", "freeboard"]
        assert (out["lat"] > 65.0).all()
        assert len(out) == int((ref["lat"] > 65.0).sum())


def test_read_and_store_cli_with_nc_engine(track_nc, tmp_path):
    """Reference-style netcdf ingest config runs end-to-end through the
    read_and_store CLI path (ref: GPSat/read_and_store.py + nc engine
    GPSat/dataloader.py:388-394)."""
    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.read_and_store import main

    path, ref = track_nc
    out = os.path.join(tmp_path, "obs.h5")
    cfg = {
        "output": {"file": out, "table": "data"},
        "file_dirs": os.path.dirname(path),
        "file_regex": r"\.nc$",
        "read_engine": "nc",
        "col_select": ["time", "lat", "lon", "freeboard"],
        "row_select": [{"col": "lat", "comp": ">", "val": 65.0}],
    }
    main(cfg)
    with TableStore(out, mode="r") as s:
        df = s.select("data", set_index=False)
    assert len(df) == int((ref["lat"] > 65.0).sum())
    assert set(["lat", "lon", "freeboard"]).issubset(df.columns)
