"""Regression: vectorized _store_batch matches per-expert construction.

The batch store path builds one DataFrame per table from stacked result
arrays; this pins its output (values, dtypes, row order, index) to an
independent per-expert loop equivalent to the pre-vectorization code
(ref schema: GPSat/local_experts.py:499-550)."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.experts import LocalExpertOI


class _FakeCore:
    param_names = ["lengthscales", "kernel_variance", "likelihood_variance"]


def _make_res(B, Pmax, rng, ragged=True):
    P_i = rng.integers(0, Pmax + 1, size=B) if ragged else np.full(B, Pmax)
    P_i[0] = 0  # at least one expert with no predictions
    pm = (np.arange(Pmax)[None, :] < P_i[:, None]).astype(float)
    res = {
        "expert_index": list(range(B)),
        "num_obs": np.asarray(rng.integers(10, 500, size=B)),
        "objective": rng.normal(size=B),
        "converged": rng.random(B) > 0.2,
        "num_iter": rng.integers(1, 40, size=B).astype(float),
        "f_mean": rng.normal(size=(B, Pmax)),
        "f_var": np.abs(rng.normal(size=(B, Pmax))),
        "y_var": np.abs(rng.normal(size=(B, Pmax))),
        "pred_mask": pm,
        "obs_mean": rng.normal(size=B),
        "lengthscales": np.abs(rng.normal(size=(B, 2))),
        "kernel_variance": np.abs(rng.normal(size=B)),
        "likelihood_variance": np.abs(rng.normal(size=B)),
    }
    return res, P_i


def _expected_tables(res, xprt_locs, coords_col, pred_coords, row_ids, per_expert_time):
    """Per-expert reference construction (the pre-vectorization logic)."""
    preds_rows, run_rows = [], []
    param_rows = {p: [] for p in _FakeCore.param_names}
    for i, ei in enumerate(res["expert_index"]):
        rl = xprt_locs.iloc[[int(ei)]]
        idx1 = LocalExpertOI._expert_index(rl, coords_col)
        P = int(res["pred_mask"][i].sum())
        if P > 0:
            pc = pred_coords[row_ids.index(int(ei))]
            data = {
                "_dim_0": np.arange(P),
                "f*": res["f_mean"][i][:P],
                "f*_var": res["f_var"][i][:P],
                "y_var": res["y_var"][i][:P],
                "f_bar": np.repeat(res["obs_mean"][i], P),
            }
            for ci, c in enumerate(coords_col):
                data[f"pred_loc_{c}"] = pc[:P, ci]
            pdf = pd.DataFrame(data)
            pdf.index = idx1.repeat(P)
            preds_rows.append(pdf)
        run_rows.append(
            pd.DataFrame(
                {
                    "_dim_0": [0],
                    "num_obs": [int(res["num_obs"][i])],
                    "run_time": [per_expert_time],
                    "objective_value": [float(res["objective"][i])],
                    "parameters_optimised": [True],
                    "optimise_success": [bool(res["converged"][i])],
                    "num_iter": [float(res["num_iter"][i])],
                    "stalled": [bool(res.get("stalled", np.zeros(len(res["expert_index"]), dtype=bool))[i])],
                    "model": ["GPR"],
                    "device": ["tpu"],
                    "config_id": [0],
                },
                index=idx1,
            )
        )
        for pname, rows in param_rows.items():
            vals = np.atleast_1d(res[pname][i])
            dims = np.indices(vals.shape).reshape(vals.ndim, -1)
            data = {f"_dim_{k}": dims[k] for k in range(vals.ndim)}
            data[pname] = vals.ravel()
            pdf = pd.DataFrame(data)
            pdf.index = idx1.repeat(len(pdf))
            rows.append(pdf)
    out = {"preds": pd.concat(preds_rows), "run_details": pd.concat(run_rows)}
    for pname, rows in param_rows.items():
        out[pname] = pd.concat(rows)
    return out


@pytest.mark.parametrize("coords_col", [["x", "y", "t"], ["x"]])
def test_store_batch_matches_per_expert(tmp_path, coords_col):
    rng = np.random.default_rng(3)
    B, Pmax = 23, 7
    xprt_locs = pd.DataFrame(
        {
            "x": rng.normal(size=B) * 1e5,
            "y": rng.normal(size=B) * 1e5,
            "t": np.arange(B) % 5,
        }
    )
    res, P_i = _make_res(B, Pmax, rng)
    pred_coords = [rng.normal(size=(Pmax, len(coords_col))) for _ in range(B)]
    row_ids = list(range(B))

    oi = LocalExpertOI.__new__(LocalExpertOI)
    oi.params_to_store = None
    sp = str(tmp_path / "out.h5")
    oi._store_batch(
        res, _FakeCore, xprt_locs, coords_col, pred_coords, row_ids,
        sp, "", True, "GPR", "tpu", 0, B * 0.5, True,
    )

    expected = _expected_tables(res, xprt_locs, coords_col, pred_coords, row_ids, 0.5)
    with TableStore(sp) as store:
        for tname, exp in expected.items():
            got = store.select(tname)
            exp_rt = exp.reset_index()
            got_rt = got.reset_index()
            assert list(got_rt.columns) == list(exp_rt.columns), tname
            pd.testing.assert_frame_equal(got_rt, exp_rt, check_dtype=False)


def test_store_batch_no_predict_skips_preds(tmp_path):
    rng = np.random.default_rng(0)
    B, Pmax = 5, 4
    coords_col = ["x", "y"]
    xprt_locs = pd.DataFrame({"x": rng.normal(size=B), "y": rng.normal(size=B)})
    res, _ = _make_res(B, Pmax, rng, ragged=False)
    oi = LocalExpertOI.__new__(LocalExpertOI)
    oi.params_to_store = ["lengthscales"]
    sp = str(tmp_path / "out.h5")
    oi._store_batch(
        res, _FakeCore, xprt_locs, coords_col,
        [rng.normal(size=(Pmax, 2)) for _ in range(B)], list(range(B)),
        sp, "", False, "GPR", "cpu", 1, 1.0, False,
    )
    with TableStore(sp) as store:
        keys = store.keys()
    assert "preds" not in keys
    assert "run_details" in keys and "lengthscales" in keys
    # params_to_store filtering honored
    assert "kernel_variance" not in keys
