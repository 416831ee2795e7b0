"""Config-driven raw-data ingest (the reference's
examples/read_and_store_raw_data.py, self-contained).

Generates raw csv track files in two subdirectories, builds a
reference-schema ingest config, runs the resumable `read_and_store`
pipeline twice to show the batch-ledger dedup, and inspects the output.

Ref: examples/read_and_store_raw_data.py; GPSat/read_and_store.py:176-315.
Run: python examples/read_and_store_raw_data.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install

import json
import tempfile

import pandas as pd

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.dataloader import DataLoader
from gpsat_tpu.read_and_store import main as read_and_store_main
from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth
from gpsat_tpu.utils import cprint

pd.set_option("display.max_columns", 200)


def main():
    work = tempfile.mkdtemp(prefix="gpsat_ingest_")
    extent = 500_000.0

    # raw csv files: raw/day1/track_*.csv, raw/day2/track_*.csv
    field, xg, yg = make_ground_truth_field(extent=extent, n=121, seed=0)
    for day in (1, 2):
        d = os.path.join(work, "raw", f"day{day}")
        os.makedirs(d)
        tracks = make_tracks(extent=extent, n_tracks=5, pts_per_track=300, seed=day)
        obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.05, obs_col="z", seed=day, keep_cols=["track"])
        for t, grp in obs.groupby("track"):
            grp.to_csv(os.path.join(d, f"track_{t}.csv"), index=False)

    obs_file = os.path.join(work, "obs.h5")
    config = {
        "output": {"file": obs_file, "table": "data"},
        "file_dirs": os.path.join(work, "raw"),
        "sub_dirs": ["day1", "day2"],
        "file_regex": r"track_\d+\.csv",
        # derived column via the named-op registry (reference: eval'd lambda)
        "col_funcs": {"z_km_scaled": {"func": "lambda z: z * 1.0", "col_args": "z"}},
    }
    config_file = os.path.join(work, "read_and_store.json")
    with open(config_file, "w") as f:
        json.dump(config, f, indent=2)

    cprint("first ingest run", "BOLD")
    read_and_store_main(dict(config))

    with TableStore(obs_file, mode="r") as ts:
        tables = ts.keys()
        n1 = len(ts.select("data", set_index=False))
    print(f"tables in store: {tables}")
    print(f"{n1} rows ingested")

    cprint("second run: batch ledger skips already-ingested files", "BOLD")
    read_and_store_main(dict(config))
    with TableStore(obs_file, mode="r") as ts:
        n2 = len(ts.select("data", set_index=False))
        ledger = ts.select("_data_batches", set_index=False)
    print(f"row count unchanged: {n1 == n2} ({n2} rows); ledger entries: {len(ledger)}")

    cprint("load the ingested table back through DataLoader", "BOLD")
    df = DataLoader.load(obs_file, table="data", where=[{"col": "track", "comp": "==", "val": 0}])
    print(df.head(3))
    cprint(f"done; store at {obs_file}", "OKGREEN")


if __name__ == "__main__":
    main()
