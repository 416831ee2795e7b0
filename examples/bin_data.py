"""Binning tour (the reference's examples/bin_data.py, self-contained).

Demonstrates the two binning entry points:
  - `DataPrep.bin_data_by`: in-memory grouped 2-d binning -> xarray-style
    Dataset / DataFrame (ref: GPSat/dataprepper.py:23-223)
  - `BinData`: config-driven pipeline incl. by-batch streaming and
    `stats_on_vals` summaries (ref: GPSat/bin_data.py:87-699)

Run: python examples/bin_data.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install

import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from gpsat_tpu.data.binning import BinData, bin_data_by
from gpsat_tpu.dataloader import DataLoader
from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth
from gpsat_tpu.utils import cprint, stats_on_vals

pd.set_option("display.max_columns", 200)


def main(out_png: str = None):
    work = tempfile.mkdtemp(prefix="gpsat_bin_data_")
    extent = 500_000.0

    # synthetic raw observations over two 'days'
    field, xg, yg = make_ground_truth_field(extent=extent, n=121, seed=0)
    frames = []
    for day in (1, 2):
        tracks = make_tracks(extent=extent, n_tracks=10, pts_per_track=500, seed=day)
        obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.05, obs_col="z", seed=day, keep_cols=["track"])
        obs["day"] = day
        frames.append(obs)
    raw = pd.concat(frames, ignore_index=True)

    # ------------------------------------------------------------------
    cprint("stats_on_vals: pre-bin data-quality summary", "BOLD")
    print(stats_on_vals(raw["z"].values, measure="z", qs=[0.05, 0.5, 0.95]).T)

    # ------------------------------------------------------------------
    cprint("DataPrep.bin_data_by: per-day 50 km grid means + counts", "BOLD")
    binned = bin_data_by(
        df=raw,
        by_cols="day",
        val_col="z",
        x_col="x",
        y_col="y",
        x_range=[-extent, extent],
        y_range=[-extent, extent],
        grid_res=50_000,
        bin_statistic=["mean", "count"],
    ).dropna(how="any").reset_index()
    print(binned.head(3))
    print(f"{len(binned)} non-empty bins over {raw['day'].nunique()} days")

    # ------------------------------------------------------------------
    cprint("BinData: config-driven, with by-batch streaming", "BOLD")
    obs_file = os.path.join(work, "obs.h5")
    DataLoader.write_to_hdf(raw, obs_file, table="data")
    out_file = os.path.join(work, "binned.h5")
    bin_config = {
        "by_cols": "day",
        "val_col": "z",
        "x_range": [-extent, extent],
        "y_range": [-extent, extent],
        "grid_res": 50_000,
    }
    bd = BinData(output={"file": out_file, "table": "data"})
    df_all, _ = bd.bin_data(input={"source": obs_file, "table": "data"}, bin_config=bin_config)
    df_batch, _ = bd.bin_data_by_batch(source=obs_file, table="data", load_by="day", bin_config=bin_config)
    a = df_all.reset_index(drop=True).sort_values(["y", "x", "day"]).reset_index(drop=True)
    b = df_batch.reset_index(drop=True).sort_values(["y", "x", "day"]).reset_index(drop=True)
    print(f"all-at-once == by-batch: {np.allclose(a['z'].values, b['z'].values)} ({len(a)} bins)")

    # ------------------------------------------------------------------
    cprint("binned field vs ground truth", "BOLD")
    day1 = a[a["day"] == 1]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].pcolormesh(xg / 1000, yg / 1000, field, shading="auto")
    axes[0].set_title("ground truth")
    sc = axes[1].scatter(day1["x"] / 1000, day1["y"] / 1000, c=day1["z"], s=8)
    axes[1].set_title("binned obs (day 1)")
    fig.colorbar(sc, ax=axes[1])
    out_png = out_png or os.path.join(work, "binned.png")
    fig.savefig(out_png, dpi=100)
    cprint(f"done; wrote {out_png}", "OKGREEN")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
