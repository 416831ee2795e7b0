"""Config-driven function application — the reference's executable-config idiom.

Reproduces ``config_func`` (ref: GPSat/utils.py:311-493): a JSON-storable
spec {func, source, args, kwargs, col_args, col_kwargs} applied to values
and/or DataFrame columns. Used by the selection DSL (row_select / where /
col_funcs) and dynamic global_select lambdas in OI configs
(ref: configs/example_local_expert_oi.json).

Security note (parity-by-design): like the reference, string funcs are
evaluated — ``lambda ...`` strings via eval, operator shorthands via a
generated lambda, and names imported from ``source``. A registry of named
ops is provided as the preferred non-eval path: pass func="@name" to look
up REGISTERED_FUNCS.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd

# preferred non-eval path: "@name" keys resolve here
REGISTERED_FUNCS = {}


def register_func(name: str):
    def deco(f):
        REGISTERED_FUNCS[name] = f
        return f

    return deco


def _builtin_registry_init():
    from gpsat_tpu.utils import projections as _proj

    REGISTERED_FUNCS.setdefault("WGS84toEASE2", _proj.WGS84toEASE2)
    REGISTERED_FUNCS.setdefault("EASE2toWGS84", _proj.EASE2toWGS84)
    # datetime helpers common in OI configs (the reference writes these as
    # eval'd lambda strings, e.g. configs/example_local_expert_oi.json;
    # named ops are the safe spelling)
    REGISTERED_FUNCS.setdefault("to_datetime", lambda x: pd.to_datetime(x).values)
    REGISTERED_FUNCS.setdefault(
        "days_since_epoch",
        lambda x: (pd.to_datetime(x) - pd.Timestamp("1970-01-01")).total_seconds().values / 86400.0,
    )


def get_col_values(df: pd.DataFrame, col, return_numpy: bool = True):
    try:
        out = df.loc[:, col]
    except KeyError:
        assert isinstance(col, int), f"col: {col} not a column name and not an int position"
        out = df.iloc[:, col]
    return out.values if return_numpy else out


def config_func(
    func,
    source: Optional[str] = None,
    args=None,
    kwargs=None,
    col_args=None,
    col_kwargs=None,
    df: Optional[pd.DataFrame] = None,
    filename_as_arg: bool = False,
    filename: Optional[str] = None,
    col_numpy: bool = True,
):
    """Apply ``func`` (callable | "@registered" | "lambda ..." | operator
    string | importable name) to args and/or DataFrame columns.

    Column args are placed before literal args; on kwarg-name collision the
    literal kwargs win (matching the reference's merge order). Returns numpy
    when the result is a Series.
    """
    _builtin_registry_init()

    args = [] if args is None else (args if isinstance(args, list) else [args])
    col_args = [] if col_args is None else (col_args if isinstance(col_args, list) else [col_args])
    kwargs = kwargs or {}
    col_kwargs = col_kwargs or {}
    assert isinstance(kwargs, dict), "kwargs must be a dict"
    assert isinstance(col_kwargs, dict), "col_kwargs must be a dict"

    if df is None:
        assert len(col_args) == 0, f"df not provided, but col_args: {col_args} were"
        assert len(col_kwargs) == 0, f"df not provided, but col_kwargs: {col_kwargs} were"
    else:
        col_args = [get_col_values(df, c, return_numpy=col_numpy) for c in col_args]
        col_kwargs = {k: get_col_values(df, c, return_numpy=col_numpy) for k, c in col_kwargs.items()}

    args = col_args + args
    if filename_as_arg and filename is not None:
        args = [filename] + args
    # literal kwargs take precedence over column kwargs on collision
    # (matches the reference's actual merge order, utils.py:478)
    kwargs = {**col_kwargs, **kwargs}

    if isinstance(func, str):
        if func.startswith("@"):
            name = func[1:]
            assert name in REGISTERED_FUNCS, f"'@{name}' not in registered funcs: {sorted(REGISTERED_FUNCS)}"
            fun = REGISTERED_FUNCS[name]
        elif re.search("^lambda", func):
            fun = eval(func)  # noqa: S307 — reference-compat executable config
        elif re.search(r"[\|&\=\+\-\*/\%<>]", func):
            fun = lambda arg1, arg2: eval(f"arg1 {func} arg2")  # noqa: S307,E731
        else:
            try:
                fun = eval(func)  # noqa: S307
            except NameError:
                assert source is not None, f"NameError on eval({func}) and no source to import from"
                import importlib

                mod = importlib.import_module(source)
                fun = getattr(mod, func)
    else:
        assert callable(func), "func is neither a string nor callable"
        fun = func

    out = fun(*args, **kwargs)
    if isinstance(out, pd.Series):
        out = out.values
    return out
