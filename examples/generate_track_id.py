"""Label satellite tracks in an observations table
(ref: examples/generate_track_id.py): adds a 'track' column using
per-date gap-based track numbering, writing back to the store.

Usage: python examples/generate_track_id.py <store.h5> [table] [datetime_col]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install


import sys

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.utils import track_num_for_date


def main(store_path: str, table: str = "data", datetime_col: str = "datetime"):
    with TableStore(store_path) as ts:
        df = ts.select(table, set_index=False)
        assert datetime_col in df.columns, f"{datetime_col} not in {list(df.columns)}"
        df["track"] = track_num_for_date(df[datetime_col].values)
        ts.put(table, df, replace=True)
    print(f"added 'track' column to {store_path}:{table} ({df['track'].nunique()} tracks)")


if __name__ == "__main__":
    main(*sys.argv[1:])
