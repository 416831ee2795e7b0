"""Config-driven CLI pipeline tests: ingest -> bin -> OI (GPR + SGPR) via
JSON configs, mirroring the reference's CLI pipeline
(ref: README.md:38-120; run_examples.sh)."""

import json

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu import bin_data as bin_data_cli
from gpsat_tpu import local_expert_oi as oi_cli
from gpsat_tpu import read_and_store as ras_cli
from gpsat_tpu.config import ExperimentConfig
from gpsat_tpu.data.store import TableStore


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    """Two days of synthetic satellite tracks as csv files."""
    root = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(1)
    for day, sub in [(1, "day1"), (2, "day2")]:
        (root / sub).mkdir()
        for trk in range(3):
            n = 200
            x = rng.uniform(0, 10, n)
            y = rng.uniform(0, 10, n)
            z = np.sin(x) * np.cos(y) + 0.1 * rng.normal(size=n)
            pd.DataFrame({"x": x, "y": y, "z": z, "day": day}).to_csv(
                root / sub / f"track_{trk}.csv", index=False
            )
    return root


class TestPipelineCLIs:
    def test_full_pipeline(self, raw_dir, tmp_path):
        obs_file = str(tmp_path / "obs.h5")
        # 1. ingest
        ras_cli.main(
            {
                "output": {"file": obs_file, "table": "data"},
                "file_dirs": str(raw_dir),
                "sub_dirs": ["day1", "day2"],
                "file_regex": r"track_\d+\.csv",
            }
        )
        # 2. bin
        binned_file = str(tmp_path / "binned.h5")
        bin_data_cli.main(
            {
                "input": {"source": obs_file, "table": "data"},
                "bin_config": {
                    "by_cols": "day",
                    "val_col": "z",
                    "x_range": [0, 10],
                    "y_range": [0, 10],
                    "grid_res": 0.5,
                },
                "output": {"file": binned_file, "table": "data"},
            }
        )
        with TableStore(binned_file, mode="r") as ts:
            binned = ts.select("data", set_index=False)
        assert len(binned) > 100 and {"x", "y", "day", "z"} <= set(binned.columns)

        # 3. OI from a JSON config (written to disk like a user would)
        store_path = str(tmp_path / "results.h5")
        cfg = {
            "locations": {
                "source": binned_file,
                "table": "data",
                "col_funcs": None,
                "row_select": [{"col": "day", "comp": "==", "val": 1}],
                "col_select": ["x", "y", "day"],
                "row_select": [
                    {"col": "day", "comp": "==", "val": 1},
                    {"func": "lambda x, y: (x % 2.5 == 1.25) & (y % 2.5 == 1.25)", "col_args": ["x", "y"]},
                ],
            },
            "data": {
                "data_source": binned_file,
                "table": "data",
                "obs_col": "z",
                "coords_col": ["x", "y", "day"],
                "local_select": [
                    {"col": ["x", "y"], "comp": "<", "val": 3.0},
                    {"col": "day", "comp": "<=", "val": 0},
                    {"col": "day", "comp": ">=", "val": 0},
                ],
            },
            "model": {
                "oi_model": "GPflowGPRModel",
                "init_params": {"kernel": "Matern32", "noise_variance": 0.01},
                "constraints": {"lengthscales": {"low": 0.05, "high": 30.0}},
                "optim_kwargs": {"max_iter": 250},
            },
            "pred_loc": {"method": "expert_loc"},
            "run_kwargs": {"store_path": store_path, "min_obs": 5},
        }
        cfg_path = str(tmp_path / "oi_config.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        oi_cli.main(cfg_path)

        with TableStore(store_path, mode="r") as ts:
            rd = ts.select("run_details").reset_index()
            preds = ts.select("preds").reset_index()
        assert len(rd) > 0
        assert rd["optimise_success"].any()
        assert np.isfinite(preds["f*"]).all()

    def test_sgpr_through_orchestrator(self, tmp_path):
        rng = np.random.default_rng(2)
        n = 800
        obs = pd.DataFrame({"x": rng.uniform(0, 10, n), "y": rng.uniform(0, 10, n)})
        obs["z"] = np.sin(obs.x) * np.cos(obs.y) + 0.1 * rng.normal(size=n)
        experts = pd.DataFrame({"x": [5.0], "y": [5.0]})
        store_path = str(tmp_path / "sgpr.h5")
        oi_cli.run_from_config(
            {
                "locations": {"source": experts},
                "data": {
                    "data_source": obs,
                    "obs_col": "z",
                    "coords_col": ["x", "y"],
                    "local_select": [{"col": ["x", "y"], "comp": "<", "val": 5.0}],
                },
                "model": {
                    "oi_model": "GPflowSGPRModel",
                    "init_params": {"noise_variance": 0.01, "num_inducing_points": 64},
                    "optim_kwargs": {"max_iter": 150},
                },
                "pred_loc": {"method": "expert_loc"},
                "run_kwargs": {"store_path": store_path},
            }
        )
        with TableStore(store_path, mode="r") as ts:
            rd = ts.select("run_details").reset_index()
            preds = ts.select("preds").reset_index()
            ip = ts.select("inducing_points").reset_index()
        assert rd["optimise_success"].all()
        # prediction at the expert should be near sin(5)cos(5)
        truth = np.sin(5.0) * np.cos(5.0)
        assert abs(preds["f*"].iloc[0] - truth) < 0.15
        assert len(ip) == 64 * 2  # M x D rows (_dim_0 x _dim_1 flattened)

    def test_experiment_config_roundtrip(self):
        d = {
            "data": {"data_source": "obs.h5", "table": "data", "obs_col": "z", "coords_col": ["x", "y"]},
            "model": {"oi_model": "GPflowGPRModel", "init_params": {"noise_variance": 0.1}},
            "locations": {"source": "locs.csv"},
            "pred_loc": {"method": "from_dataframe", "max_dist": 200, "df_file": "grid.csv"},
            "run_kwargs": {"store_path": "out.h5", "store_every": 5},
            "comment": "test",
        }
        ec = ExperimentConfig.from_dict(d)
        assert ec.data_config.obs_col == "z"
        assert ec.prediction_locs_config.max_dist == 200
        out = ec.to_dict()
        assert out["data"]["table"] == "data"
        assert out["pred_loc"]["df_file"] == "grid.csv"
        assert out["run_kwargs"]["store_every"] == 5
        assert out["comment"] == "test"

    def test_reference_config_shape_loads(self):
        # structure copied from the reference's canonical OI config shape
        # (configs/example_local_expert_oi.json): dynamic global_select
        # lambda, tuple-key col_funcs as stringified keys
        d = {
            "data": {
                "data_source": "binned.h5",
                "table": "data",
                "obs_col": "z",
                "coords_col": ["x", "y", "t"],
                "local_select": [
                    {"col": "t", "comp": "<=", "val": 4},
                    {"col": "t", "comp": ">=", "val": -4},
                    {"col": ["x", "y"], "comp": "<", "val": 300000},
                ],
                "global_select": [
                    {"loc_col": "t", "src_col": "date", "func": "lambda x,y: np.datetime64(pd.Timestamp(x+y))"}
                ],
            },
            "model": {
                "oi_model": "GPflowGPRModel",
                "init_params": {"coords_scale": [50000, 50000, 1]},
                "constraints": {"lengthscales": {"low": [1e-08, 1e-08, 1e-08], "high": [600000, 600000, 9]}},
            },
            "locations": {"source": "locs.csv", "col_funcs": {"('x', 'y')": {"func": "@WGS84toEASE2", "col_args": ["lon", "lat"]}}},
            "pred_loc": {"method": "from_dataframe", "df_file": "grid.csv", "max_dist": 200000},
            "run_kwargs": {"store_path": "out.h5"},
        }
        ec = ExperimentConfig.from_dict(d)
        # tuple keys restored by nested_dict_literal_eval
        assert ("x", "y") in ec.expert_locs_config.col_funcs
        assert ec.model_config.init_params["coords_scale"] == [50000, 50000, 1]


class TestSVGPOrchestrator:
    def test_svgp_through_orchestrator(self, tmp_path):
        rng = np.random.default_rng(4)
        n = 600
        obs = pd.DataFrame({"x": rng.uniform(0, 10, n), "y": rng.uniform(0, 10, n)})
        obs["z"] = np.sin(obs.x) * np.cos(obs.y) + 0.1 * rng.normal(size=n)
        experts = pd.DataFrame({"x": [5.0], "y": [5.0]})
        store_path = str(tmp_path / "svgp.h5")
        from gpsat_tpu import local_expert_oi as oi_cli

        oi_cli.run_from_config(
            {
                "locations": {"source": experts},
                "data": {
                    "data_source": obs,
                    "obs_col": "z",
                    "coords_col": ["x", "y"],
                    "local_select": [{"col": ["x", "y"], "comp": "<", "val": 5.0}],
                },
                "model": {
                    "oi_model": "GPflowSVGPModel",
                    "init_params": {"noise_variance": 0.01, "num_inducing_points": 32},
                    "optim_kwargs": {"max_iter": 600, "learning_rate": 0.05},
                },
                "pred_loc": {"method": "expert_loc"},
                "run_kwargs": {"store_path": store_path},
            }
        )
        from gpsat_tpu.data.store import TableStore

        with TableStore(store_path, mode="r") as ts:
            rd = ts.select("run_details").reset_index()
            preds = ts.select("preds").reset_index()
            qmu = ts.select("inducing_mean").reset_index()
        assert rd["optimise_success"].all()
        truth = np.sin(5.0) * np.cos(5.0)
        assert abs(preds["f*"].iloc[0] - truth) < 0.2
        assert len(qmu) == 32
