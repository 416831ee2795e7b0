"""Read-only pandas-HDFStore (PyTables) interop.

PyTables is not in this image, so the fixture is written by hand with
h5py to the exact layout pandas produces for ``format='table'`` frames
(one compound dataset 'table': index fields, [n, k] values blocks with
pickled column lists in ``<field>_kind`` attrs, scalar data_columns) —
the layout documented in pandas/io/pytables.py and stable since pandas
0.x. The reader under test: gpsat_tpu/data/pytables_compat.py.
"""

import pickle

import h5py
import numpy as np
import pandas as pd
import pytest


def _write_frame_table(f, key, *, index_fields, blocks, data_columns=(), nrows=None):
    """Hand-write one pandas 'frame_table' group.

    index_fields: {name: (values, kind)}; blocks: [(field_name, colnames,
    2-d values[, dtype_str])] where dtype_str mirrors pandas's
    ``<field>_dtype`` attr (e.g. 'datetime64', 'string40', 'float64');
    data_columns: [(field_name, values, kind)].
    """
    grp = f.create_group(key)
    grp.attrs["pandas_type"] = np.bytes_(b"frame_table")
    grp.attrs["table_type"] = np.bytes_(b"appendable_frame")
    grp.attrs["encoding"] = np.bytes_(b"UTF-8")
    grp.attrs["index_cols"] = np.void(pickle.dumps([(0, n) for n in index_fields]))

    dtype = []
    for n, (vals, kind) in index_fields.items():
        dtype.append((n, vals.dtype))
    for fn, _, vals, *_ in blocks:
        dtype.append((fn, vals.dtype, (vals.shape[1],)))
    for fn, vals, _ in data_columns:
        dtype.append((fn, vals.dtype))
    n = nrows if nrows is not None else len(next(iter(index_fields.values()))[0])
    rec = np.zeros(n, dtype=dtype)
    for name, (vals, kind) in index_fields.items():
        rec[name] = vals
    for fn, _, vals, *_ in blocks:
        rec[fn] = vals
    for fn, vals, _ in data_columns:
        rec[fn] = vals
    ds = grp.create_dataset("table", data=rec)
    ds.attrs["CLASS"] = np.bytes_(b"TABLE")
    ds.attrs["NROWS"] = n
    j = 0
    for name, (vals, kind) in index_fields.items():
        ds.attrs[f"FIELD_{j}_NAME"] = np.bytes_(name.encode())
        ds.attrs[f"{name}_kind"] = np.bytes_(kind.encode())
        j += 1
    for fn, cols, _, *dt in blocks:
        ds.attrs[f"FIELD_{j}_NAME"] = np.bytes_(fn.encode())
        ds.attrs[f"{fn}_kind"] = np.void(pickle.dumps(list(cols)))
        if dt:
            ds.attrs[f"{fn}_dtype"] = np.bytes_(dt[0].encode())
        j += 1
    for fn, _, dtype_str in data_columns:
        ds.attrs[f"FIELD_{j}_NAME"] = np.bytes_(fn.encode())
        # real pandas DataCol layout: <fn>_kind is a PICKLED LIST of the
        # column names (DataCol.set_attr stores self.values), the type
        # string lives in <fn>_dtype — unlike IndexCol's plain kind string
        ds.attrs[f"{fn}_kind"] = np.void(pickle.dumps([fn]))
        ds.attrs[f"{fn}_dtype"] = np.bytes_(dtype_str.encode())
        j += 1


@pytest.fixture
def ref_store(tmp_path):
    """A store shaped like the reference's outputs: an obs 'data' table
    (int index + float block + string data_column) and a result table
    multi-indexed by expert coordinates."""
    path = str(tmp_path / "ref.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        n = 10
        _write_frame_table(
            f, "data",
            index_fields={"index": (np.arange(n, dtype=np.int64), "integer")},
            blocks=[("values_block_0", ["x", "y", "obs"], rng.normal(size=(n, 3)))],
            data_columns=[("sat", np.array([b"S3A", b"S3B"] * 5, dtype="S3"), "string")],
        )
        m = 4
        _write_frame_table(
            f, "lengthscales",
            index_fields={
                "x": (np.array([1.0, 1.0, 2.0, 2.0]), "float"),
                "y": (np.array([0.0, 1.0, 0.0, 1.0]), "float"),
            },
            blocks=[("values_block_0", ["_dim_0", "lengthscales"],
                     np.stack([np.zeros(m), rng.uniform(1, 2, m)], axis=1))],
        )
    return path


def test_detect_and_list(ref_store, tmp_path):
    from gpsat_tpu.data import pytables_compat as PT
    from gpsat_tpu.data.store import TableStore

    assert PT.is_pytables_store(ref_store)
    assert PT.list_tables(ref_store) == ["data", "lengthscales"]
    # a native TableStore file is NOT detected as pytables
    own = str(tmp_path / "own.h5")
    with TableStore(own) as s:
        s.append("t", pd.DataFrame({"a": [1.0]}))
    assert not PT.is_pytables_store(own)


def test_read_obs_table(ref_store):
    from gpsat_tpu.data import pytables_compat as PT

    df = PT.read_table(ref_store, "data")
    assert list(df.columns) == ["x", "y", "obs", "sat"]
    assert len(df) == 10
    assert df["sat"].iloc[0] == "S3A"
    assert df.index.equals(pd.RangeIndex(10).astype(np.int64).rename(None).astype("int64"))


def test_read_multiindex_result_table(ref_store):
    from gpsat_tpu.data import pytables_compat as PT

    df = PT.read_table(ref_store, "lengthscales")
    assert df.index.names == ["x", "y"]
    assert list(df.columns) == ["_dim_0", "lengthscales"]
    assert (df["lengthscales"] > 1.0).all()


def test_where_and_loader_integration(ref_store):
    from gpsat_tpu.data import dataloader as DL
    from gpsat_tpu.data import pytables_compat as PT

    sub = PT.read_table(ref_store, "data", where=[{"col": "sat", "comp": "==", "val": "S3A"}])
    assert len(sub) == 5

    # DataLoader.load transparently detects the reference format
    df = DL.load(ref_store, table="lengthscales")
    assert {"x", "y", "lengthscales"} <= set(df.columns)
    assert len(df) == 4


def test_get_results_from_pytables_store(tmp_path):
    """A reference-produced results store opens through the standard
    results reader (ref: local_experts.py:1467-1620 equivalent)."""
    import json as _json

    from gpsat_tpu.experts import get_results_from_h5file

    path = str(tmp_path / "ref_results.h5")
    cfg = {"model": {"oi_model": "GPflowGPRModel"}}
    with h5py.File(path, "w") as f:
        _write_frame_table(
            f, "oi_config",
            index_fields={"index": (np.arange(1, dtype=np.int64), "integer")},
            data_columns=[
                ("idx", np.array([1], dtype=np.int64), "integer"),
                ("config", np.array([_json.dumps(cfg).encode()], dtype="S200"), "string"),
            ],
            blocks=[],
        )
        _write_frame_table(
            f, "run_details",
            index_fields={"x": (np.array([1.0, 2.0]), "float"),
                          "y": (np.array([0.0, 0.0]), "float")},
            blocks=[("values_block_0", ["num_obs", "objective_value"],
                     np.array([[10.0, -5.0], [12.0, -6.0]]))],
        )
        _write_frame_table(
            f, "expert_locs",
            index_fields={"x": (np.array([1.0, 2.0]), "float"),
                          "y": (np.array([0.0, 0.0]), "float")},
            blocks=[("values_block_0", ["elev"], np.array([[3.0], [4.0]]))],
        )
    dfs, configs = get_results_from_h5file(path)
    assert configs == [cfg]
    assert "run_details" in dfs
    rd = dfs["run_details"]
    assert {"x", "y", "num_obs", "objective_value", "elev"} <= set(rd.columns)
    assert len(rd) == 2


def test_warm_start_from_pytables_store(tmp_path):
    """load_params={'file': <reference store>} warm-starts from a
    PyTables-format results file transparently (predict-only rerun)."""
    import numpy as np
    import pandas as pd

    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.experts import LocalExpertOI

    # reference-format store with per-expert hyperparameters
    path = str(tmp_path / "ref_params.h5")
    xs, ys = np.array([3.0, 7.0]), np.array([3.0, 7.0])
    with h5py.File(path, "w") as f:
        _write_frame_table(
            f, "lengthscales",
            index_fields={"x": (np.repeat(xs, 2), "float"),
                          "y": (np.repeat(ys, 2), "float")},
            blocks=[("values_block_0", ["_dim_0", "lengthscales"],
                     np.stack([np.tile([0.0, 1.0], 2), [1.5, 2.5, 1.7, 2.7]], axis=1))],
        )
        _write_frame_table(
            f, "kernel_variance",
            index_fields={"x": (xs, "float"), "y": (ys, "float")},
            blocks=[("values_block_0", ["_dim_0", "kernel_variance"],
                     np.stack([np.zeros(2), [0.8, 0.9]], axis=1))],
        )
        _write_frame_table(
            f, "likelihood_variance",
            index_fields={"x": (xs, "float"), "y": (ys, "float")},
            blocks=[("values_block_0", ["_dim_0", "likelihood_variance"],
                     np.stack([np.zeros(2), [0.01, 0.02]], axis=1))],
        )

    rng = np.random.default_rng(0)
    obs = pd.DataFrame({"x": rng.uniform(0, 10, 300), "y": rng.uniform(0, 10, 300)})
    obs["obs"] = np.sin(obs["x"]) + 0.05 * rng.normal(size=300)
    oi = LocalExpertOI(
        expert_loc_config={"source": pd.DataFrame({"x": xs, "y": ys})},
        data_config={"data_source": obs, "obs_col": "obs", "coords_col": ["x", "y"],
                     "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}]},
        model_config={"oi_model": "GPflowGPRModel", "load_params": {"file": path}},
        pred_loc_config={"method": "expert_loc"},
    )
    out = str(tmp_path / "out.h5")
    oi.run(store_path=out, optimise=False)
    with TableStore(out, mode="r") as s:
        ls = s.select("lengthscales", set_index=False).sort_values(["x", "_dim_0"])
    np.testing.assert_allclose(ls["lengthscales"].values, [1.5, 2.5, 1.7, 2.7])


def test_string_and_datetime_values_blocks(tmp_path):
    """Columns stored in non-data_column values blocks decode too: string
    blocks (fixed-width bytes) -> str, datetime64 blocks (int64 ns) ->
    datetime64[ns] — the layout run_details 'model'/'device' and date
    columns take in real reference stores."""
    import h5py

    from gpsat_tpu.data import pytables_compat as PT

    path = str(tmp_path / "blk.h5")
    n = 3
    # PyTables always stores datetime64 blocks as int64 NANOSECONDS
    dates = pd.to_datetime(["2020-03-01", "2020-03-02", "2020-03-05"]).as_unit("ns")
    with h5py.File(path, "w") as f:
        _write_frame_table(
            f,
            "run_details",
            index_fields={"index": (np.arange(n), "integer")},
            blocks=[
                ("values_block_0", ["num_obs"], np.arange(n, dtype=float)[:, None], "float64"),
                ("values_block_1", ["model", "device"],
                 np.array([[b"GPflowGPRModel", b"gpu"]] * n, dtype="S16"), "string16"),
                ("values_block_2", ["date"],
                 dates.asi8[:, None], "datetime64"),
            ],
        )
    df = PT.read_table(path, "run_details")
    assert df["model"].tolist() == ["GPflowGPRModel"] * n
    assert df["device"].tolist() == ["gpu"] * n
    assert df["date"].dtype == np.dtype("datetime64[ns]")
    assert list(df["date"]) == list(dates)
    # a filter on the decoded string column matches (the failure mode:
    # bytes left undecoded make this select nothing)
    assert (df["model"] == "GPflowGPRModel").all()


def test_scalar_datetime_data_column(tmp_path):
    """datetime64 stored as a scalar data_column (the standard reference
    setup for HDFStore where-queries on 'date'): the column must come back
    as datetime64, not raw int64 nanoseconds, and string where-queries
    must work against it."""
    from gpsat_tpu.data import pytables_compat as PT

    path = str(tmp_path / "dtcol.h5")
    dates = np.array(
        ["2020-03-04", "2020-03-05", "2020-03-06"], dtype="datetime64[ns]"
    )
    with h5py.File(path, "w") as f:
        _write_frame_table(
            f, "data",
            index_fields={"index": (np.arange(3, dtype=np.int64), "integer")},
            blocks=[("values_block_0", ["obs"], np.arange(3.0).reshape(3, 1))],
            data_columns=[("date", dates.view("int64"), "datetime64[ns]")],
        )
    df = PT.read_table(path, "data")
    assert list(df.columns) == ["obs", "date"]
    assert np.issubdtype(df["date"].dtype, np.datetime64)
    np.testing.assert_array_equal(df["date"].values, dates)
    sel = PT.read_table(path, "data", where=["date >= '2020-03-05'"])
    assert list(sel["obs"]) == [1.0, 2.0]
