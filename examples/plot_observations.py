"""Plot raw/binned observations from an h5 store
(ref: examples/plot_observations.py).

Usage: python examples/plot_observations.py <store.h5> [table] [val_col]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install


import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.plot_utils import plot_hist


def main(store_path: str, table: str = "data", val_col: str = "z", out_png: str = "observations.png"):
    with TableStore(store_path, mode="r") as ts:
        df = ts.select(table, set_index=False)
    fig, axs = plt.subplots(1, 2, figsize=(11, 4.5))
    x_col = "x" if "x" in df.columns else df.columns[0]
    y_col = "y" if "y" in df.columns else df.columns[1]
    s = axs[0].scatter(df[x_col], df[y_col], c=df[val_col], s=2, cmap="RdBu_r")
    axs[0].set_title(f"{val_col} ({len(df)} rows)")
    axs[0].set_aspect("equal")
    fig.colorbar(s, ax=axs[0])
    plot_hist(axs[1], df[val_col].values, xlabel=val_col, stats_values=["mean", "std", "num_not_nan"])
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    print(f"saved: {out_png}")


if __name__ == "__main__":
    main(*sys.argv[1:])
