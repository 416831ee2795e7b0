"""Flagship end-to-end example (the reference's examples/inline_example.py
flow, self-contained with synthetic data):

  synthetic satellite tracks -> bin onto a 50 km grid -> expert grid ->
  batched OI (exact GPR, constrained, mesh-sharded) -> hyperparameter
  smoothing -> predict-only re-run with smoothed params -> glue
  overlapping predictions -> plot.

Run: python examples/inline_example.py [--quick]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install


import argparse
import os
import tempfile

import numpy as np
import pandas as pd


def make_synthetic_tracks(n_tracks: int = 40, pts_per_track: int = 600, seed: int = 0) -> pd.DataFrame:
    """Noisy altimeter-like tracks over a 1000 km EASE2-like box sampling a
    smooth 'mean sea surface' field."""
    rng = np.random.default_rng(seed)
    rows = []
    extent = 500_000.0  # m
    for t in range(n_tracks):
        # straight track with random heading through the box
        theta = rng.uniform(0, np.pi)
        offset = rng.uniform(-extent, extent)
        s = np.linspace(-1.5 * extent, 1.5 * extent, pts_per_track)
        x = s * np.cos(theta) - offset * np.sin(theta)
        y = s * np.sin(theta) + offset * np.cos(theta)
        keep = (np.abs(x) < extent) & (np.abs(y) < extent)
        x, y = x[keep], y[keep]
        field = 0.4 * np.sin(x / 150_000) * np.cos(y / 200_000) + 0.2 * np.sin((x + y) / 300_000)
        z = field + 0.05 * rng.normal(size=len(x))
        rows.append(pd.DataFrame({"x": x, "y": y, "z": z, "track": t, "date": "2020-03-05"}))
    return pd.concat(rows, ignore_index=True)


def main(quick: bool = False):
    import jax

    if not any(d.platform != "cpu" for d in jax.devices()):
        import gpsat_tpu

        gpsat_tpu.enable_x64()

    from gpsat_tpu.data.binning import bin_data_by
    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.experts import LocalExpertOI, get_results_from_h5file
    from gpsat_tpu.local_expert_oi import run_from_config
    from gpsat_tpu.postprocess import SmoothingConfig, glue_local_predictions_2d, smooth_hyperparameters
    from gpsat_tpu.utils import grid_2d_flatten

    out_dir = tempfile.mkdtemp(prefix="gpsat_tpu_example_")
    store_path = os.path.join(out_dir, "results.h5")
    extent = 500_000.0

    # 1. observations -> 50 km binned grid
    obs = make_synthetic_tracks(n_tracks=10 if quick else 40)
    print(f"raw observations: {len(obs)}")
    df_bin = (
        bin_data_by(
            obs,
            by_cols="date",
            val_col="z",
            x_range=[-extent, extent],
            y_range=[-extent, extent],
            grid_res=50_000,
        )
        .dropna()
        .reset_index()
    )
    print(f"binned cells: {len(df_bin)}")

    # 2. expert grid: 200 km spacing
    xy = grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=200_000)
    experts = pd.DataFrame({"x": xy[:, 0], "y": xy[:, 1]})

    # 3. batched OI sweep
    cfg = {
        "locations": {"source": experts},
        "data": {
            "data_source": df_bin,
            "obs_col": "z",
            "coords_col": ["x", "y"],
            "local_select": [{"col": ["x", "y"], "comp": "<", "val": 300_000}],
        },
        "model": {
            "oi_model": "GPflowGPRModel",
            "init_params": {"coords_scale": [50_000, 50_000], "obs_mean": "local", "noise_variance": 0.01},
            "constraints": {"lengthscales": {"low": 10_000, "high": 600_000}},
            "optim_kwargs": {"max_iter": 200 if quick else 500},
        },
        "pred_loc": {
            "method": "from_dataframe",
            "df": pd.DataFrame(
                {
                    "x": grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=25_000)[:, 0],
                    "y": grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=25_000)[:, 1],
                }
            ),
            "max_dist": 200_000,
        },
        "run_kwargs": {"store_path": store_path, "min_obs": 5},
    }
    run_from_config(cfg)

    # 4. smooth hyperparameters + predict-only re-run
    smooth_hyperparameters(
        result_file=store_path,
        params_to_smooth=["lengthscales", "kernel_variance"],
        smooth_config_dict={
            "lengthscales": SmoothingConfig(l_x=200_000, l_y=200_000),
            "kernel_variance": SmoothingConfig(l_x=200_000, l_y=200_000),
        },
        save_config_file=False,
    )
    cfg2 = {**cfg, "model": {**cfg["model"], "load_params": {"file": store_path, "table_suffix": "_SMOOTHED"}}}
    cfg2["run_kwargs"] = {
        **cfg["run_kwargs"],
        "optimise": False,
        "table_suffix": "_SMOOTHED",
        "skip_valid_checks_on": ["model", "run_kwargs"],
    }
    run_from_config(cfg2)

    # 5. glue overlapping expert predictions
    dfs, _ = get_results_from_h5file(store_path, table_suffix="_SMOOTHED")
    preds = dfs["preds_SMOOTHED"]
    glued = glue_local_predictions_2d(
        preds,
        pred_loc_cols=["pred_loc_x", "pred_loc_y"],
        xprt_loc_cols=["x", "y"],
        vars_to_glue=["f*", "f*_var", "y_var"],
        inference_radius=200_000,
    )
    truth = 0.4 * np.sin(glued["pred_loc_x"] / 150_000) * np.cos(glued["pred_loc_y"] / 200_000) + 0.2 * np.sin(
        (glued["pred_loc_x"] + glued["pred_loc_y"]) / 300_000
    )
    fbar = preds.groupby(["pred_loc_x", "pred_loc_y"])["f_bar"].mean().reset_index()
    glued = glued.merge(fbar, on=["pred_loc_x", "pred_loc_y"])
    rmse = float(np.sqrt(np.mean((glued["f*"] + glued["f_bar"] - truth) ** 2)))
    print(f"glued predictions: {len(glued)}; rmse vs truth: {rmse:.4f} (noise 0.05)")

    # 6. plot
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 2, figsize=(11, 4.5))
        s = axs[0].scatter(glued["pred_loc_x"], glued["pred_loc_y"], c=glued["f*"] + glued["f_bar"], s=4, cmap="RdBu_r")
        axs[0].set_title("glued posterior mean")
        fig.colorbar(s, ax=axs[0])
        s = axs[1].scatter(glued["pred_loc_x"], glued["pred_loc_y"], c=np.sqrt(glued["y_var"]), s=4, cmap="viridis")
        axs[1].set_title("predictive std")
        fig.colorbar(s, ax=axs[1])
        out_png = os.path.join(out_dir, "inline_example.png")
        fig.savefig(out_png, dpi=120)
        print(f"plot saved: {out_png}")
    except Exception as e:  # plotting is optional
        print(f"plotting skipped: {e}")

    print(f"results store: {store_path}")
    return store_path, rmse


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(quick=ap.parse_args().quick)
