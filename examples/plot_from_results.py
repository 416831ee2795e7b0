"""Plot predictions + hyperparameter fields from a results store
(ref: examples/plot_from_results.py).

Usage: python examples/plot_from_results.py <results.h5> [table_suffix]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install


import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from gpsat_tpu.experts import get_results_from_h5file
from gpsat_tpu.plot_utils import plot_hyper_parameters


def main(results_file: str, table_suffix: str = "", out_png: str = "results.png"):
    dfs, configs = get_results_from_h5file(results_file, table_suffix=table_suffix)
    preds_key = f"preds{table_suffix}"
    if preds_key in dfs:
        p = dfs[preds_key]
        fig, axs = plt.subplots(1, 2, figsize=(11, 4.5))
        s = axs[0].scatter(p["pred_loc_x"], p["pred_loc_y"], c=p["f*"], s=3, cmap="RdBu_r")
        axs[0].set_title("posterior mean f*")
        axs[0].set_aspect("equal")
        fig.colorbar(s, ax=axs[0])
        s = axs[1].scatter(p["pred_loc_x"], p["pred_loc_y"], c=np.sqrt(p["y_var"]), s=3, cmap="viridis")
        axs[1].set_title("predictive std")
        axs[1].set_aspect("equal")
        fig.colorbar(s, ax=axs[1])
        fig.tight_layout()
        fig.savefig(out_png, dpi=120)
        print(f"saved: {out_png}")

    coords_col = configs[-1]["data"]["coords_col"] if configs else ["x", "y"]
    fig = plot_hyper_parameters(dfs, coords_col=coords_col, table_suffix=table_suffix)
    hp_png = out_png.replace(".png", "_hyperparams.png")
    fig.savefig(hp_png, dpi=120)
    print(f"saved: {hp_png}")


if __name__ == "__main__":
    main(*sys.argv[1:])
