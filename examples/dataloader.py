"""DataLoader tour (the reference's examples/dataloader.py, self-contained).

Walks the unified `DataLoader.load` entry point across every supported
engine (csv, parquet, HDF5, netCDF, zarr) and the selection DSL
(`where` dicts, `row_select` incl. registered functions, `col_funcs`
incl. tuple-output projections, local radius selection).

Ref: examples/dataloader.py; GPSat/dataloader.py:1522-1679.
Run: python examples/dataloader.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install

import tempfile

import numpy as np
import pandas as pd

from gpsat_tpu.dataloader import DataLoader
from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth
from gpsat_tpu.utils import cprint

pd.set_option("display.max_columns", 200)


def make_raw(work: str) -> pd.DataFrame:
    """Synthetic altimeter-like tracks with lon/lat + a value column."""
    field, xg, yg = make_ground_truth_field(extent=500_000.0, n=121, seed=0)
    tracks = make_tracks(extent=500_000.0, n_tracks=6, pts_per_track=300, seed=1)
    obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.05, obs_col="z", seed=1, keep_cols=["track"])
    # lon/lat columns so the projection col_funcs below have real input
    from gpsat_tpu.utils import EASE2toWGS84

    obs["lon"], obs["lat"] = EASE2toWGS84(obs["x"].values, obs["y"].values)
    obs["datetime"] = pd.Timestamp("2020-03-05") + pd.to_timedelta(np.arange(len(obs)), unit="s")
    return obs


def main():
    work = tempfile.mkdtemp(prefix="gpsat_dataloader_")
    obs = make_raw(work)

    # ------------------------------------------------------------------
    cprint("load: csv (engine inferred from suffix)", "BOLD")
    csv_file = os.path.join(work, "obs.csv")
    obs.to_csv(csv_file, index=False)
    df = DataLoader.load(csv_file)
    print(df.head(3))

    # ------------------------------------------------------------------
    cprint("load: multiple csv files matched by regex", "BOLD")
    raw_dir = os.path.join(work, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    for t, grp in obs.groupby("track"):
        grp.to_csv(os.path.join(raw_dir, f"track_{t}.csv"), index=False)
    df_multi = DataLoader.read_from_multiple_files(file_dirs=raw_dir, file_regex=r"track_\d+\.csv")
    print(f"{len(df_multi)} rows from {obs['track'].nunique()} files")

    # ------------------------------------------------------------------
    cprint("load: parquet / HDF5 / netCDF / zarr", "BOLD")
    pq_file = os.path.join(work, "obs.parquet")
    obs.drop(columns=["datetime"]).to_parquet(pq_file)
    print("parquet:", len(DataLoader.load(pq_file)), "rows")

    h5_file = os.path.join(work, "obs.h5")
    DataLoader.write_to_hdf(obs.drop(columns=["datetime"]), h5_file, table="data")
    print("hdf5:   ", len(DataLoader.load(h5_file, table="data")), "rows")

    nc_file = os.path.join(work, "obs.nc")
    coarse = obs[["x", "y", "z"]].copy()
    coarse["x"] = (coarse["x"] // 100_000) * 100_000.0  # coarsen so the dense grid stays small
    coarse["y"] = (coarse["y"] // 100_000) * 100_000.0
    DataLoader.write_to_netcdf(coarse.groupby(["x", "y"]).mean(), nc_file)
    print("netcdf: ", len(DataLoader.load(nc_file)), "rows (dense grid, NaN-padded)")

    from gpsat_tpu.data.zarr_reader import write_zarr

    zarr_store = os.path.join(work, "obs.zarr")
    write_zarr(zarr_store, {c: (("index",), obs[c].values) for c in ["x", "y", "z"]})
    print("zarr:   ", len(DataLoader.load(zarr_store, engine="zarr")), "rows")

    # ------------------------------------------------------------------
    cprint("where dicts: {col, comp, val} — pushed down at read time", "BOLD")
    df_w = DataLoader.load(
        h5_file,
        table="data",
        where=[{"col": "track", "comp": "<=", "val": 2}, {"col": "z", "comp": ">=", "val": 0.0}],
    )
    print(f"{len(df_w)} rows with track<=2 and z>=0 (of {len(obs)})")

    # ------------------------------------------------------------------
    cprint("row_select: scalar comparisons + registered functions", "BOLD")
    df_r = DataLoader.load(
        csv_file,
        row_select=[{"func": "lambda track: track % 2 == 0", "col_args": "track"}],
    )
    print(f"{len(df_r)} rows on even tracks")

    # ------------------------------------------------------------------
    cprint("col_funcs: derived columns incl. tuple-output projections", "BOLD")
    df_c = DataLoader.load(
        csv_file,
        col_funcs={
            ("ex", "ey"): {"source": "gpsat_tpu.utils", "func": "WGS84toEASE2", "col_args": ["lon", "lat"]},
            "t": {"func": "lambda x: x / 1000.0", "col_args": "x"},
        },
        col_select=["ex", "ey", "t", "z"],
    )
    print(df_c.head(3))
    rt = np.max(np.abs(df_c["ex"].values - obs["x"].values))
    print(f"WGS84toEASE2(EASE2toWGS84(x)) max abs round-trip error: {rt:.3e}")

    # ------------------------------------------------------------------
    cprint("local_data_select: per-expert radius window (KDTree)", "BOLD")
    ref_loc = pd.DataFrame({"x": [0.0], "y": [0.0]})
    local = DataLoader.local_data_select(
        obs,
        reference_location=ref_loc,
        local_select=[{"col": ["x", "y"], "comp": "<", "val": 200_000}],
    )
    r = np.hypot(local["x"], local["y"]).max()
    print(f"{len(local)} rows within 200 km of the origin (max radius {r/1000:.1f} km)")

    cprint(f"done; artifacts under {work}", "OKGREEN")


if __name__ == "__main__":
    main()
