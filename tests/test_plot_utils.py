"""Smoke tests for plotting (Agg backend): each entry point produces a
figure without cartopy present."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from gpsat_tpu import plot_utils as PU

rng = np.random.default_rng(0)


@pytest.fixture()
def dfs():
    n = 200
    preds = pd.DataFrame(
        {
            "x": rng.uniform(-1e6, 1e6, n),
            "y": rng.uniform(-1e6, 1e6, n),
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(60, 89, n),
            "f*": rng.normal(size=n),
            "_dim_0": np.zeros(n, dtype=int),
        }
    )
    ls = preds[["x", "y"]].copy()
    ls["_dim_0"] = 0
    ls["lengthscales"] = rng.uniform(0.5, 2.0, n)
    return {"preds": preds, "lengthscales": ls}


class TestPlotUtils:
    def test_plot_pcolormesh_scatter_fallback(self, dfs):
        fig, ax = plt.subplots()
        PU.plot_pcolormesh(
            ax, dfs["preds"]["lon"], dfs["preds"]["lat"], dfs["preds"]["f*"].values,
            fig=fig, scatter=True, qvmin=0.01, qvmax=0.99,
        )
        plt.close(fig)

    def test_plot_hist_stats(self, dfs):
        fig, ax = plt.subplots()
        PU.plot_hist(ax, dfs["preds"]["f*"].values, stats_values=["mean", "std"], xlabel="f*")
        plt.close(fig)

    def test_plots_from_config_grid(self, dfs):
        fig = PU.plots_from_config(
            [
                {"plot_type": "hist", "table": "preds", "val_col": "f*"},
                {"plot_type": "xy_heatmap", "table": "preds", "val_col": "f*"},
                # scatter mode (lon/lat), reference plot_utils.py:325-345
                {"plot_type": "heatmap", "table": "preds", "val_col": "f*",
                 "lon_col": "lon", "lat_col": "lat", "plot_kwargs": {"scatter": True}},
                # gridded mode (x/y -> 2d array -> WGS84), reference :289-323
                {"plot_type": "heatmap", "table": "preds", "val_col": "f*",
                 "x_col": "x", "y_col": "y"},
            ],
            dfs,
        )
        plt.close(fig)

    def test_plot_hyper_parameters(self, dfs):
        fig = PU.plot_hyper_parameters(dfs, coords_col=["x", "y"], table_names=["lengthscales"])
        plt.close(fig)

    def test_plot_wrapper(self, dfs):
        fig = PU.plot_wrapper(dfs["preds"], val_col="f*")
        plt.close(fig)

    def test_plot_minimal_example(self):
        from gpsat_tpu.models import get_model

        pred, params, fig = PU.plot_minimal_example(
            get_model("GPflowGPRModel"), opt_params={"max_iter": 100}
        )
        assert np.isfinite(pred["f*"]).all() and "lengthscales" in params
        plt.close(fig)

    def test_get_projection_fallback(self):
        p = PU.get_projection("north")
        assert p == {"laea_lat_0": 90} or PU.HAS_CARTOPY
        with pytest.raises(ValueError):
            if not PU.HAS_CARTOPY:
                raise ValueError("x")  # parity: cartopy branch raises on bad name
            PU.get_projection("sideways")


def test_results_plots_respect_load_kwargs_and_weights(dfs):
    """load_kwargs route through the loader (row_select etc., reference
    DataLoader.load passthrough) and weighted_values_kwargs combine
    overlapping predictions before plotting."""
    fig, ax = plt.subplots()
    dfp = dfs["preds"].copy()
    dfp["ex"] = dfp["x"] + 0.1  # fake expert location column
    dfp["ey"] = dfp["y"]
    PU.plot_pcolormesh_from_results_data(
        ax, {"preds": dfp}, "preds", "f*",
        lon_col="lon", lat_col="lat", fig=fig,
        load_kwargs={"row_select": [{"col": "f*", "comp": ">=", "val": float(dfp["f*"].median())}]},
        plot_kwargs={"scatter": True},
    )
    plt.close(fig)
    fig, ax = plt.subplots()
    PU.plot_xy_heatmap_from_results_data(
        ax, {"preds": dfp}, "preds", "f*", x_col="x", y_col="y", fig=fig,
    )
    plt.close(fig)


def test_gridded_pcolormesh_non_square_grid():
    """Regression: the gridded (scatter=False) path must meshgrid the 1-d
    axes from dataframe_to_2d_array before projecting — a non-square grid
    used to crash on shape mismatch inside EASE2toWGS84."""
    nx, ny = 7, 5  # deliberately non-square
    xs = np.linspace(-1e6, 1e6, nx)
    ys = np.linspace(-5e5, 5e5, ny)
    x2d, y2d = np.meshgrid(xs, ys)
    df = pd.DataFrame(
        {"x": x2d.ravel(), "y": y2d.ravel(), "f*": rng.normal(size=nx * ny)}
    )
    fig, ax = plt.subplots()
    PU.plot_pcolormesh_from_results_data(
        ax, {"preds": df}, "preds", "f*", x_col="x", y_col="y", fig=fig,
    )
    plt.close(fig)
