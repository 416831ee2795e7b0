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
from gpsat_tpu.plot_utils import plot_wrapper  # noqa: F401  (ref: bin_data.py:764)


def get_bin_data_config():
    """Config from sys.argv, falling back to the example bin config with
    example data paths (ref: GPSat/bin_data.py:853-875)."""
    import json
    import os
    import warnings

    from gpsat_tpu import get_config_path, get_parent_path
    from gpsat_tpu.utils.misc import nested_dict_literal_eval

    config = get_config_from_sysargv()
    if config is None:
        config_file = get_config_path("example_bin_raw_data.json")
        warnings.warn(f"\nconfig is empty / not provided, will just use an example config:\n{config_file}")
        with open(config_file, "r") as f:
            config = nested_dict_literal_eval(json.load(f))
        config["input"]["file"] = get_parent_path("data", "example", "ABC.h5")
        config["output"]["file"] = get_parent_path("data", "example", "ABC_binned.h5")
        assert os.path.exists(config["input"]["file"]), (
            f"config['input']['file']:\n{config['input']['file']}\ndoes not exist. "
            f"to create run: python -m gpsat_tpu.read_and_store"
        )
    return config


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
