from gpsat_tpu.utils.config_func import config_func, register_func, REGISTERED_FUNCS
from gpsat_tpu.utils.grids import grid_2d_flatten, grid_nd_flatten
from gpsat_tpu.utils.misc import (
    cprint,
    compare_dataframes,
    get_config_from_sysargv,
    guess_track_num,
    json_serializable,
    nested_dict_literal_eval,
    nll,
    pandas_to_dict,
    rmse,
    stats_on_vals,
    to_array,
    track_num_for_date,
)
from gpsat_tpu.utils.projections import (
    EASE2toWGS84,
    EASE2toWGS84_New,
    WGS84toEASE2,
    WGS84toEASE2_New,
)
from gpsat_tpu.utils.tables import (
    array_to_dataframe,
    dataframe_to_2d_array,
    dataframe_to_array,
    dict_of_array_to_dict_of_dataframe,
    make_multiindex_df,
    match,
    mindex_df_to_dataarray,
    pip_freeze_to_dataframe,
)
from gpsat_tpu.utils.weights import get_weighted_values

import numpy as _np


def sigmoid(x, low=0, high=1):
    """Scaled sigmoid mapping R -> (low, high) (ref: GPSat/utils.py:2377-2380)."""
    assert high > low
    return (high - low) / (1 + _np.exp(-_np.asarray(x, dtype=float))) + low


def inverse_sigmoid(y, low=0, high=1):
    """Inverse of :func:`sigmoid`; +/-inf outside [low, high]
    (ref: GPSat/utils.py:2382-2400 numba kernel semantics)."""
    assert high > low
    y = _np.asarray(y, dtype=float)
    with _np.errstate(divide="ignore", invalid="ignore"):
        out = -_np.log((high - low) / (y - low) - 1)
    out = _np.where(y <= low, -_np.inf, out)
    out = _np.where(y >= high, _np.inf, out)
    return out


# Reference-placement aliases: these live in GPSat/utils.py but are
# implemented in more specific modules here; resolved lazily to avoid
# import cycles (experts/postprocess import gpsat_tpu.utils).
_LAZY_ALIASES = {
    # name -> (module, attr); ref: GPSat/utils.py locations in each docstring
    "sparse_true_array": ("gpsat_tpu.data.expert_locations", "sparse_true_array"),
    "get_previous_oi_config": ("gpsat_tpu.experts", "get_previous_oi_config"),
    "check_prev_oi_config": ("gpsat_tpu.experts", "check_prev_oi_config"),
    "get_git_information": ("gpsat_tpu.data.ingest", "get_git_information"),
    "glue_local_predictions": ("gpsat_tpu.postprocess", "glue_local_predictions"),
    "bin_obs_by_date": ("gpsat_tpu.data.binning", "bin_obs_by_date"),
    "log_lines": ("gpsat_tpu.utils.misc", "log_lines"),
    "not_nan": ("gpsat_tpu.utils.misc", "not_nan"),
    "assign_category_col": ("gpsat_tpu.utils.misc", "assign_category_col"),
    "convert_lon_lat_str": ("gpsat_tpu.utils.misc", "convert_lon_lat_str"),
    "diff_distance": ("gpsat_tpu.utils.misc", "diff_distance"),
    "expand_dict_by_vals": ("gpsat_tpu.utils.misc", "expand_dict_by_vals"),
    "json_load": ("gpsat_tpu.utils.misc", "json_load"),
    "move_to_archive": ("gpsat_tpu.utils.misc", "move_to_archive"),
    "pretty_print_class": ("gpsat_tpu.utils.misc", "pretty_print_class"),
    "get_col_values": ("gpsat_tpu.utils.config_func", "get_col_values"),
    "softplus": ("gpsat_tpu.ops.transforms", "softplus"),
    "inverse_softplus": ("gpsat_tpu.ops.transforms", "inverse_softplus"),
}


def __getattr__(name):
    try:
        mod_name, attr = _LAZY_ALIASES[name]
    except KeyError:
        raise AttributeError(f"module 'gpsat_tpu.utils' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


__all__ = [
    "sigmoid",
    "inverse_sigmoid",
    *_LAZY_ALIASES,
    "config_func",
    "register_func",
    "REGISTERED_FUNCS",
    "grid_2d_flatten",
    "grid_nd_flatten",
    "cprint",
    "compare_dataframes",
    "get_config_from_sysargv",
    "guess_track_num",
    "json_serializable",
    "nested_dict_literal_eval",
    "nll",
    "pandas_to_dict",
    "rmse",
    "stats_on_vals",
    "to_array",
    "track_num_for_date",
    "EASE2toWGS84",
    "WGS84toEASE2",
    "WGS84toEASE2_New",
    "EASE2toWGS84_New",
    "array_to_dataframe",
    "dataframe_to_2d_array",
    "dataframe_to_array",
    "dict_of_array_to_dict_of_dataframe",
    "make_multiindex_df",
    "match",
    "mindex_df_to_dataarray",
    "pip_freeze_to_dataframe",
    "get_weighted_values",
]
