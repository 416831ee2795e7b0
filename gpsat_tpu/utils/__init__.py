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
from gpsat_tpu.utils.projections import EASE2toWGS84, WGS84toEASE2
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

__all__ = [
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
