"""1-D local-expert tutorial (the reference's notebook pair
docs/notebooks/1d_local_expert_model_part_1.ipynb / part_2.ipynb as a
runnable script): fit sin(1/x) from noisy samples with overlapping local
GP experts driven through the config-dataclass API, then glue the
per-expert predictions into one field and score it.

Run: python examples/tutorial_1d_local_experts.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np
import pandas as pd
import scipy.stats

import jax

jax.config.update("jax_platforms", "cpu")

import gpsat_tpu

gpsat_tpu.enable_x64()

from gpsat_tpu.config import DataConfig, ExpertLocsConfig, ModelConfig, PredictionLocsConfig
from gpsat_tpu.experts import LocalExpertOI, get_results_from_h5file
from gpsat_tpu.postprocess import glue_local_predictions_1d


def run_experiment(xprt_locs, training_radius, data_df, grid_df, store_path):
    """Part-2 flow: four config dataclasses -> LocalExpertOI.run."""
    inference_radius = training_radius + 1e-8
    locexp = LocalExpertOI(
        expert_loc_config=ExpertLocsConfig(source=pd.DataFrame({"x": xprt_locs})),
        model_config=ModelConfig(
            oi_model="sklearnGPRModel",
            init_params={"likelihood_variance": 0.05**2, "kernel": "RBF", "verbose": False},
        ),
        data_config=DataConfig(
            data_source=data_df,
            obs_col=["y"],
            coords_col=["x"],
            local_select=[
                {"col": "x", "comp": "<=", "val": training_radius},
                {"col": "x", "comp": ">=", "val": -training_radius},
            ],
        ),
        pred_loc_config=PredictionLocsConfig(method="from_dataframe", df=grid_df, max_dist=inference_radius),
    )
    if os.path.exists(store_path):
        os.remove(store_path)
    locexp.run(store_path=store_path)

    dfs, _ = get_results_from_h5file(store_path)
    glued = glue_local_predictions_1d(
        preds_df=dfs["preds"],
        pred_loc_col="pred_loc_x",
        xprt_loc_col="x",
        vars_to_glue=["f*", "f*_var"],
        inference_radius=inference_radius,
    )
    return glued


def main():
    # --- the notebook's toy problem: y = sin(1/x) + noise on [0.1, 0.6]
    rng = np.random.default_rng(0)
    N, noise_std = 100, 0.05
    X_grid = np.linspace(0.1, 0.6, 100)
    X = rng.uniform(0.1, 0.6, N)
    f = lambda x: np.sin(1.0 / x)  # noqa: E731
    y = f(X) + noise_std * rng.standard_normal(N)
    f_truth = f(X_grid)
    data_df = pd.DataFrame({"x": X, "y": y})
    grid_df = pd.DataFrame({"x": X_grid})

    store = os.path.join(tempfile.mkdtemp(), "tutorial_1d.h5")

    # part 2: two experts, radius 0.15
    glued = run_experiment([0.25, 0.45], 0.15, data_df, grid_df, store)
    m, s = glued["f*"].values, np.sqrt(glued["f*_var"].values)
    truth = f(glued["pred_loc_x"].values)
    print(f"2 experts : MSE {np.mean((truth - m) ** 2):.4f}, "
          f"MLL {scipy.stats.norm.logpdf(truth, m, s).mean():.4f}")

    # "Using more local experts": four experts, radius 0.1
    glued = run_experiment([0.2, 0.3, 0.4, 0.5], 0.1, data_df, grid_df, store)
    m, s = glued["f*"].values, np.sqrt(glued["f*_var"].values)
    truth = f(glued["pred_loc_x"].values)
    mse = np.mean((truth - m) ** 2)
    print(f"4 experts : MSE {mse:.4f}, MLL {scipy.stats.norm.logpdf(truth, m, s).mean():.4f}")
    assert mse < 0.05, f"tutorial regression: 4-expert MSE {mse} too high"

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(X_grid, f_truth, "k", label="ground truth")
        ax.scatter(X, y, color="C3", alpha=0.5, s=12, label="observations")
        ax.plot(glued["pred_loc_x"], m, "C0", label="glued predictions (4 experts)")
        ax.fill_between(glued["pred_loc_x"], m - 1.96 * s, m + 1.96 * s, color="C0", alpha=0.25)
        ax.legend()
        out = os.path.join(os.path.dirname(store), "tutorial_1d.png")
        fig.savefig(out, dpi=120)
        print(f"plot saved: {out}")
    except Exception as e:  # plotting is optional
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()
