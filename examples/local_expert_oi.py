"""Config-driven local-expert OI run (the reference's
examples/local_expert_oi.py, self-contained).

Builds example binned data, writes a reference-schema OI JSON config,
runs it through `run_from_config` (the `python -m gpsat_tpu.local_expert_oi`
entry point), then demonstrates restart semantics: a re-run skips every
expert already present in `run_details`.

Ref: examples/local_expert_oi.py; GPSat/local_experts.py:761-1279.
Run: python examples/local_expert_oi.py [config.json]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install

import json
import tempfile
import time

import pandas as pd

pd.set_option("display.max_columns", 200)


def make_config(work: str) -> dict:
    """Example binned data + a reference-schema OI config dict."""
    from gpsat_tpu.data.binning import bin_data_by
    from gpsat_tpu.dataloader import DataLoader
    from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth

    extent = 500_000.0
    field, xg, yg = make_ground_truth_field(extent=extent, n=121, seed=0)
    tracks = make_tracks(extent=extent, n_tracks=12, pts_per_track=500, seed=1)
    obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.05, obs_col="z", seed=1)
    obs["day"] = 1
    binned = bin_data_by(
        df=obs, by_cols="day", val_col="z", x_range=[-extent, extent], y_range=[-extent, extent], grid_res=50_000
    ).dropna(how="any").reset_index()
    binned_file = os.path.join(work, "binned.h5")
    DataLoader.write_to_hdf(binned, binned_file, table="data")

    return {
        "locations": {
            "source": binned_file,
            "table": "data",
            # experts on a 200 km grid, offset to cell centers
            "row_select": [
                {"func": "lambda x, y: (x % 200000 == 25000.0) & (y % 200000 == 25000.0)", "col_args": ["x", "y"]}
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
        "run_kwargs": {"store_path": os.path.join(work, "results.h5"), "min_obs": 5},
    }


def main(config_file: str = None):
    import jax

    # CPU reference-parity (f64) mode by default; set GPSAT_EXAMPLE_PLATFORM=tpu
    # to run on an attached TPU (f32 production mode) instead.
    if os.environ.get("GPSAT_EXAMPLE_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        import gpsat_tpu

        gpsat_tpu.enable_x64()

    from gpsat_tpu.experts import get_results_from_h5file
    from gpsat_tpu.local_expert_oi import run_from_config
    from gpsat_tpu.utils import cprint

    if config_file is None:
        work = tempfile.mkdtemp(prefix="gpsat_oi_")
        config = make_config(work)
        config_file = os.path.join(work, "local_expert_oi.json")
        with open(config_file, "w") as f:
            json.dump(config, f, indent=2)
    else:
        with open(config_file) as f:
            config = json.load(f)

    cprint(f"running OI from config: {config_file}", "BOLD")
    t0 = time.time()
    run_from_config(dict(config))
    t1 = time.time()

    results_file = config["run_kwargs"]["store_path"]
    dfs, oi_configs = get_results_from_h5file(results_file)
    rd = dfs["run_details"]
    print(f"\n{len(rd)} experts in {t1 - t0:.1f} s "
          f"({int(rd['optimise_success'].sum())} converged; config_ids: {sorted(rd['config_id'].unique())})")
    print(dfs["preds"].head(3))

    cprint("re-run: experts already in run_details are skipped", "BOLD")
    t0 = time.time()
    run_from_config(dict(config))
    t1 = time.time()
    rd2 = get_results_from_h5file(results_file)[0]["run_details"]
    print(f"re-run took {t1 - t0:.1f} s; run_details rows unchanged: {len(rd2) == len(rd)}")
    cprint(f"done; results at {results_file}", "OKGREEN")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
