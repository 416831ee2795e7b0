"""Config-replay regression (the reference's golden-file tier,
ref: tests/integration.py:44-50): run an experiment from a file-based
config, then rebuild the experiment FROM THE CONFIG STORED IN THE RESULTS
FILE and re-run into a fresh store — outputs must match exactly."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.experts import get_results_from_h5file
from gpsat_tpu.local_expert_oi import run_from_config
from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth


@pytest.mark.slow
class TestConfigReplay:
    def test_replay_reproduces_results(self, tmp_path):
        # synthetic controlled-accuracy setup (SURVEY.md §2.8)
        field, xg, yg = make_ground_truth_field(extent=10.0, n=50)
        tracks = make_tracks(extent=10.0, n_tracks=12, pts_per_track=120)
        obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.05, obs_col="z", seed=1)

        obs_file = str(tmp_path / "obs.h5")
        with TableStore(obs_file) as ts:
            ts.append("data", obs)
        experts = pd.DataFrame({"x": [-5.0, 5.0, -5.0, 5.0], "y": [-5.0, -5.0, 5.0, 5.0]})
        locs_file = str(tmp_path / "locs.csv")
        experts.to_csv(locs_file, index=False)

        cfg = {
            "locations": {"source": locs_file},
            "data": {
                "data_source": obs_file,
                "table": "data",
                "obs_col": "z",
                "coords_col": ["x", "y"],
                "local_select": [{"col": ["x", "y"], "comp": "<", "val": 7.0}],
            },
            "model": {
                "oi_model": "GPflowGPRModel",
                "init_params": {"noise_variance": 0.0025},
                "optim_kwargs": {"max_iter": 250},
            },
            "pred_loc": {"method": "expert_loc"},
            "run_kwargs": {"store_path": str(tmp_path / "run1.h5")},
        }
        run_from_config(cfg)

        # read the embedded config back and replay it into a new store
        dfs1, configs = get_results_from_h5file(str(tmp_path / "run1.h5"))
        stored = configs[-1]
        stored_cfg = {
            "locations": stored["locations"],
            "data": stored["data"],
            "model": stored["model"],
            "pred_loc": stored["pred_loc"],
            "run_kwargs": {**stored["run_kwargs"], "store_path": str(tmp_path / "run2.h5")},
        }
        run_from_config(stored_cfg)
        dfs2, _ = get_results_from_h5file(str(tmp_path / "run2.h5"))

        p1 = dfs1["preds"].sort_values(["x", "y", "_dim_0"]).reset_index(drop=True)
        p2 = dfs2["preds"].sort_values(["x", "y", "_dim_0"]).reset_index(drop=True)
        np.testing.assert_allclose(p2["f*"].values, p1["f*"].values, rtol=0, atol=0)
        np.testing.assert_allclose(p2["f*_var"].values, p1["f*_var"].values, rtol=0, atol=0)
        l1 = dfs1["lengthscales"].sort_values(["x", "y", "_dim_0"])["lengthscales"].values
        l2 = dfs2["lengthscales"].sort_values(["x", "y", "_dim_0"])["lengthscales"].values
        np.testing.assert_array_equal(l1, l2)

    def test_recovery_accuracy_vs_ground_truth(self, tmp_path):
        # controlled accuracy: posterior mean should beat the noise floor
        field, xg, yg = make_ground_truth_field(extent=10.0, n=50, seed=3)
        tracks = make_tracks(extent=10.0, n_tracks=30, pts_per_track=200, seed=3)
        obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.1, obs_col="z", seed=3)
        experts = pd.DataFrame({"x": [0.0], "y": [0.0]})
        store = str(tmp_path / "gt.h5")
        run_from_config(
            {
                "locations": {"source": experts},
                "data": {
                    "data_source": obs,
                    "obs_col": "z",
                    "coords_col": ["x", "y"],
                    "local_select": [{"col": ["x", "y"], "comp": "<", "val": 6.0}],
                },
                "model": {
                    "oi_model": "GPflowGPRModel",
                    "init_params": {"noise_variance": 0.01, "obs_mean": "local"},
                    "optim_kwargs": {"max_iter": 300},
                },
                "pred_loc": {
                    "method": "shift_arrays",
                    "x": np.linspace(-2, 2, 5),
                    "y": np.linspace(-2, 2, 5),
                },
                "run_kwargs": {"store_path": store},
            }
        )
        dfs, _ = get_results_from_h5file(store)
        p = dfs["preds"]
        from gpsat_tpu.synthetic import interp_2d

        truth = interp_2d(field, xg, yg, p["pred_loc_x"].values, p["pred_loc_y"].values)
        err = np.sqrt(np.mean((p["f*"].values + p["f_bar"].values - truth) ** 2))
        assert err < 0.1, f"posterior rmse {err} worse than the noise floor"
