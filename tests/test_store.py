"""TableStore round-trip / append / where-select tests.

Mirrors the storage semantics the reference relies on (multi-indexed result
tables with where-pushdown reads; ref: GPSat/local_experts.py:499-550,
:608-689)."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.store import TableStore


@pytest.fixture()
def store(tmp_path):
    with TableStore(str(tmp_path / "t.h5")) as s:
        yield s


def _sample_df():
    return pd.DataFrame(
        {
            "x": [1.0, 2.0, 3.0, 4.0],
            "y": [10.0, 20.0, 30.0, 40.0],
            "n": [1, 2, 3, 4],
            "name": ["a", "b", "c", "d"],
            "flag": [True, False, True, False],
            "date": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-03", "2020-01-04"]),
        }
    )


class TestTableStore:
    def test_roundtrip(self, store):
        df = _sample_df()
        store.append("tab", df)
        out = store.select("tab")
        pd.testing.assert_frame_equal(out, df)

    def test_multiindex_roundtrip(self, store):
        df = _sample_df().set_index(["x", "y"])
        store.append("tab", df)
        out = store.select("tab")
        assert out.index.names == ["x", "y"]
        pd.testing.assert_frame_equal(out, df)

    def test_append_accumulates(self, store):
        df = _sample_df()
        store.append("tab", df)
        store.append("tab", df)
        assert len(store.select("tab")) == 8

    def test_where_dict_and_string(self, store):
        store.append("tab", _sample_df())
        out = store.select("tab", where=[{"col": "x", "comp": ">=", "val": 3.0}])
        assert list(out["n"]) == [3, 4]
        out = store.select("tab", where="x >= 3")
        assert list(out["n"]) == [3, 4]
        out = store.select("tab", where="name == 'b'")
        assert list(out["n"]) == [2]
        out = store.select("tab", where=[{"col": "date", "comp": "<=", "val": "2020-01-02"}])
        assert list(out["n"]) == [1, 2]
        out = store.select("tab", where=[{"col": "x", "comp": "==", "val": [1.0, 4.0]}])
        assert list(out["n"]) == [1, 4]
        out = store.select("tab", where=[{"col": "x", "comp": ">", "val": 1.0, "negate": True}])
        assert list(out["n"]) == [1]

    def test_schema_mismatch_raises(self, store):
        store.append("tab", _sample_df())
        with pytest.raises(AssertionError, match="schema mismatch"):
            store.append("tab", pd.DataFrame({"zzz": [1.0]}))

    def test_attrs(self, store):
        store.put_attrs("tab", config={"a": 1, "nested": {"b": [1, 2]}})
        assert store.get_attrs("tab")["config"] == {"a": 1, "nested": {"b": [1, 2]}}

    def test_put_replaces(self, store):
        store.put("tab", _sample_df())
        store.put("tab", _sample_df().iloc[:2])
        assert len(store.select("tab")) == 2

    def test_select_missing_table(self, store):
        with pytest.raises(AssertionError, match="not in store"):
            store.select("nope")


class TestNumericCrossAppend:
    """int<->float cross-appends reconcile instead of raising — restarting
    against a store written before a column widened (e.g. run_details
    num_iter int -> float) must keep working."""

    def test_float_into_int_integral_casts(self, store):
        store.append("t", pd.DataFrame({"n": np.array([1, 2], dtype=np.int64)}))
        store.append("t", pd.DataFrame({"n": np.array([3.0, 4.0])}))
        out = store.select("t")
        assert list(out["n"]) == [1, 2, 3, 4]

    def test_float_into_int_nan_promotes(self, store):
        store.append("t", pd.DataFrame({"n": np.array([1, 2], dtype=np.int64)}))
        store.append("t", pd.DataFrame({"n": np.array([3.5, np.nan])}))
        out = store.select("t")
        assert out["n"].dtype.kind == "f"
        np.testing.assert_array_equal(out["n"].values[:3], [1.0, 2.0, 3.5])
        assert np.isnan(out["n"].values[3])

    def test_int_into_float_casts(self, store):
        store.append("t", pd.DataFrame({"n": np.array([1.5, 2.5])}))
        store.append("t", pd.DataFrame({"n": np.array([3, 4], dtype=np.int64)}))
        out = store.select("t")
        assert list(out["n"]) == [1.5, 2.5, 3.0, 4.0]

    def test_string_vs_numeric_still_raises(self, store):
        store.append("t", pd.DataFrame({"n": ["a", "b"]}))
        with pytest.raises(AssertionError, match="dtype mismatch"):
            store.append("t", pd.DataFrame({"n": np.array([1.0, 2.0])}))

    def test_nonfitting_int_promotes_not_wraps(self, store):
        """Values that don't round-trip through the stored int dtype must
        promote the column, never wrap (e.g. -1 into unsigned storage)."""
        store.append("t", pd.DataFrame({"n": np.array([1, 2], dtype=np.uint8)}))
        store.append("t", pd.DataFrame({"n": np.array([-1, 300], dtype=np.int64)}))
        out = store.select("t")
        assert list(out["n"]) == [1, 2, -1, 300]

    def test_wide_int_into_narrow_promotes(self, store):
        store.append("t", pd.DataFrame({"n": np.array([1, 2], dtype=np.int32)}))
        big = np.array([2**40, 5], dtype=np.int64)
        store.append("t", pd.DataFrame({"n": big}))
        out = store.select("t")
        assert list(out["n"]) == [1, 2, 2**40, 5]

    def test_integral_float_too_wide_for_int_promotes(self, store):
        store.append("t", pd.DataFrame({"n": np.array([1, 2], dtype=np.int16)}))
        store.append("t", pd.DataFrame({"n": np.array([1e6, 3.0])}))
        out = store.select("t")
        assert list(out["n"]) == [1.0, 2.0, 1e6, 3.0]
