"""Generate the example pipeline configs + synthetic raw data used by
run_examples.sh (the reference ships these as configs/example_*.json;
here the data is synthesized so the pipeline is self-contained).

Usage: python examples/make_example_configs.py <work_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install


import json
import os
import sys

import numpy as np
import pandas as pd

from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth


def main(work: str):
    os.makedirs(work, exist_ok=True)
    extent = 500_000.0

    # raw csv tracks in two subdirectories (two 'days')
    field, xg, yg = make_ground_truth_field(extent=extent, n=121, seed=0)
    for day, sub in [(1, "day1"), (2, "day2")]:
        d = os.path.join(work, "raw", sub)
        os.makedirs(d, exist_ok=True)
        tracks = make_tracks(extent=extent, n_tracks=8, pts_per_track=400, seed=day)
        obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.05, obs_col="z", seed=day, keep_cols=["track"])
        obs["day"] = day
        for t, grp in obs.groupby("track"):
            grp.to_csv(os.path.join(d, f"track_{t}.csv"), index=False)

    obs_file = os.path.join(work, "obs.h5")
    binned_file = os.path.join(work, "binned.h5")
    results_file = os.path.join(work, "results.h5")

    configs = {
        "read_and_store.json": {
            "output": {"file": obs_file, "table": "data"},
            "file_dirs": os.path.join(work, "raw"),
            "sub_dirs": ["day1", "day2"],
            "file_regex": r"track_\d+\.csv",
        },
        "bin_data.json": {
            "input": {"source": obs_file, "table": "data"},
            "bin_config": {
                "by_cols": "day",
                "val_col": "z",
                "x_range": [-extent, extent],
                "y_range": [-extent, extent],
                "grid_res": 50_000,
            },
            "output": {"file": binned_file, "table": "data"},
        },
        "local_expert_oi.json": {
            "locations": {
                "source": binned_file,
                "table": "data",
                "row_select": [
                    {"col": "day", "comp": "==", "val": 1},
                    {
                        "func": "lambda x, y: (x % 200000 == 25000.0) & (y % 200000 == 25000.0)",
                        "col_args": ["x", "y"],
                    },
                ],
                "col_select": ["x", "y", "day"],
            },
            "data": {
                "data_source": binned_file,
                "table": "data",
                "obs_col": "z",
                "coords_col": ["x", "y", "day"],
                "local_select": [
                    {"col": ["x", "y"], "comp": "<", "val": 300_000},
                    {"col": "day", "comp": "<=", "val": 0},
                    {"col": "day", "comp": ">=", "val": 0},
                ],
            },
            "model": {
                "oi_model": "GPflowGPRModel",
                "init_params": {"coords_scale": [50_000, 50_000, 1], "obs_mean": "local", "noise_variance": 0.0025},
                "constraints": {"lengthscales": {"low": [5_000, 5_000, 1e-8], "high": [600_000, 600_000, 9]}},
                "optim_kwargs": {"max_iter": 400},
            },
            "pred_loc": {"method": "expert_loc"},
            "run_kwargs": {"store_path": results_file, "min_obs": 5},
        },
        "postprocessing.json": {
            "result_file": results_file,
            "params_to_smooth": ["lengthscales", "kernel_variance"],
            "smooth_config_dict": {
                "lengthscales": {"l_x": 200_000, "l_y": 200_000},
                "kernel_variance": {"l_x": 200_000, "l_y": 200_000, "max": 5.0},
            },
        },
    }
    for name, cfg in configs.items():
        with open(os.path.join(work, name), "w") as f:
            json.dump(cfg, f, indent=2)
    print(f"configs + raw data written under {work}")


if __name__ == "__main__":
    main(sys.argv[1])
