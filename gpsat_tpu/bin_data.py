"""CLI: bin raw observations onto a regular grid (ref: GPSat/bin_data.py).

Usage: python -m gpsat_tpu.bin_data <config.json>

Config keys (reference-compatible): input {source/file, table, where,
batch, load_by, ...}, bin_config {by_cols, val_col, grid_res, x_range,
y_range, bin_statistic, ...}, output {file, table}, add_output_cols.
"""

from gpsat_tpu.data.binning import BinData
from gpsat_tpu.utils.misc import cprint, get_config_from_sysargv

# re-export the library surface under the reference's module path
from gpsat_tpu.data.binning import bin_data, bin_data_by  # noqa: F401


def main(config: dict = None):
    if config is None:
        config = get_config_from_sysargv()
    assert config is not None, "no config provided; usage: python -m gpsat_tpu.bin_data <config.json>"
    config = dict(config)
    config.pop("comment", None)
    bd = BinData()
    df_bin, stats = bd.bin_data(
        input=config.get("input"),
        bin_config=config.get("bin_config"),
        output=config.get("output"),
        add_output_cols=config.get("add_output_cols"),
    )
    if df_bin is not None:
        cprint(f"binned {len(df_bin)} cells", c="OKGREEN")
    return df_bin, stats


if __name__ == "__main__":
    main()
