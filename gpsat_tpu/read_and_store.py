"""CLI: raw flat files -> observations table (ref: GPSat/read_and_store.py).

Usage: python -m gpsat_tpu.read_and_store <config.json>

Config keys (reference-compatible): output {file, table}, file_dirs /
base_dirs, sub_dirs, file_regex, col_funcs, row_select, col_select,
read_engine, read_kwargs, batch.
"""

from gpsat_tpu.data.ingest import get_dirs_to_search, read_and_store  # noqa: F401
from gpsat_tpu.utils.misc import cprint, get_config_from_sysargv


def update_attr(x, cid, vals):
    """Copy-modify-return an attrs dict (HDF attrs don't update in place;
    ref: GPSat/read_and_store.py:19-27)."""
    assert isinstance(x, dict)
    tmp = x.copy()
    tmp[cid] = vals
    return tmp


def main(config: dict = None):
    if config is None:
        config = get_config_from_sysargv()
    assert config is not None, "no config provided; usage: python -m gpsat_tpu.read_and_store <config.json>"
    config = dict(config)
    config.pop("comment", None)
    output = config.pop("output")
    file_dirs = config.pop("file_dirs", config.pop("base_dirs", None))
    file_regex = config.pop("file_regex")
    out = read_and_store(output=output, file_dirs=file_dirs, file_regex=file_regex, **config)
    cprint(f"done; observations stored in: {out}", c="OKGREEN")
    return out


if __name__ == "__main__":
    main()
