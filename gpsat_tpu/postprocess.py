"""Post-processing: hyperparameter-field smoothing + prediction gluing.

Re-designs GPSat/postprocessing.py for the TPU build:

- ``gaussian_2d_weight`` (ref: postprocessing.py:22-52, numba guvectorize
  'parallel') becomes a vectorized all-pairs jnp computation — the weight
  matrix is an [n, n] elementwise op + one matmul-shaped reduction, which
  XLA fuses; NaN values carry zero weight, all-NaN targets return NaN.
- ``smooth_hyperparameters`` (ref: postprocessing.py:96-380) reads the
  per-expert hyperparameter tables, smooths each (x, y) field per
  other-dimension slice, writes ``<param><suffix>_SMOOTHED`` tables (plus
  copies of unsmoothed params), and emits a predict-only OI config with
  ``optimise=False`` + ``load_params`` pointing at the smoothed tables.
- ``glue_local_predictions_1d/2d`` (ref: postprocessing.py:447-577):
  normalized Gaussian-weighted averaging of overlapping expert
  predictions, sigma = inference_radius / R.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.experts import get_results_from_h5file
from gpsat_tpu.models import get_model
from gpsat_tpu.utils.misc import cprint, json_serializable


def gaussian_2d_weight(x0, y0, x, y, l_x, l_y, vals):
    """NaN-aware Gaussian-kernel weighted mean onto target points.

    out[i] = sum_j w_ij vals_j / sum_j w_ij over non-NaN vals_j, with
    w_ij = exp(-(((x_j-x0_i)/l_x)^2 + ((y_j-y0_i)/l_y)^2)/2); NaN when all
    weights vanish. Matches the reference numba kernel
    (ref: postprocessing.py:22-52) but as one vectorized [n_t, n_s] op.
    """
    import jax
    import jax.numpy as jnp

    # f64 when x64 is on (CPU parity mode); the widest available float
    # otherwise — requesting f64 with x64 off truncates with a warning
    dt = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    x0 = jnp.asarray(x0, dtype=dt)
    y0 = jnp.asarray(y0, dtype=dt)
    x = jnp.asarray(x, dtype=dt)
    y = jnp.asarray(y, dtype=dt)
    vals = jnp.asarray(vals, dtype=dt)

    d2 = ((x[None, :] - x0[:, None]) / l_x) ** 2 + ((y[None, :] - y0[:, None]) / l_y) ** 2
    w = jnp.exp(-d2 / 2.0)
    ok = jnp.isfinite(vals)
    w = w * ok[None, :]
    w_sum = jnp.sum(w, axis=1)
    w_val = jnp.sum(w * jnp.where(ok, vals, 0.0)[None, :], axis=1)
    out = jnp.where(w_sum == 0.0, jnp.nan, w_val / jnp.where(w_sum == 0.0, 1.0, w_sum))
    return np.asarray(out)


@dataclasses.dataclass
class SmoothingConfig:
    """Per-parameter smoothing spec (ref: postprocessing.py:55-93)."""

    l_x: Union[int, float] = 1
    l_y: Union[int, float] = 1
    max: Union[int, float, None] = None
    min: Union[int, float, None] = None

    def __getitem__(self, item):
        if hasattr(self, item):
            return getattr(self, item)
        raise AttributeError(f"{item} is not an attribute of {type(self)}")

    def get(self, key, default=None):
        return self[key] if hasattr(self, key) else default


def smooth_hyperparameters(
    result_file: str,
    params_to_smooth: List[str],
    smooth_config_dict: Dict[str, Union[SmoothingConfig, dict]],
    xy_dims: List[str] = ["x", "y"],
    reference_table_suffix: str = "",
    table_suffix: str = "_SMOOTHED",
    output_file: Optional[str] = None,
    model_name: Optional[str] = None,
    save_config_file: bool = True,
):
    """Smooth per-expert hyperparameter fields; write *_SMOOTHED tables and
    (optionally) a predict-only config JSON. Returns the config path."""
    assert table_suffix != reference_table_suffix
    assert len(xy_dims) == 2, "dimensions to smooth over must have length 2"
    x_col, y_col = xy_dims

    smooth_config_dict = {
        k: (v if isinstance(v, SmoothingConfig) else SmoothingConfig(**v))
        for k, v in smooth_config_dict.items()
    }

    # model name -> param_names via a pseudo-model (ref: :183-216)
    if model_name is None:
        with TableStore(result_file, mode="r") as store:
            run_details = store.select(f"run_details{reference_table_suffix}")
        unique_models = run_details["model"].unique()
        assert len(unique_models) == 1, (
            f"more than one model found in run_details{reference_table_suffix}: {unique_models}"
        )
        model_name = str(unique_models[-1]).split(".")[-1]
        print(f"found model_name: {model_name}")

    pseudo = pd.DataFrame([[0.0, 1.0]], columns=["x", "y"])
    model_ = get_model(model_name)(data=pseudo, coords_col="x", obs_col="y")
    all_params = model_.param_names
    assert all(p in all_params for p in params_to_smooth), (
        f"some params_to_smooth {params_to_smooth} not in model.param_names {all_params}"
    )
    other_params = [p for p in all_params if p not in params_to_smooth]

    smooth_with_suffix = [f"{p}{reference_table_suffix}" for p in params_to_smooth]
    other_with_suffix = [f"{p}{reference_table_suffix}" for p in other_params]
    smooth_config_dict = {f"{k}{reference_table_suffix}": v for k, v in smooth_config_dict.items()}

    dfs, oi_configs = get_results_from_h5file(
        result_file,
        merge_on_expert_locations=False,
        select_tables=all_params,
        table_suffix=reference_table_suffix,
        add_suffix_to_table=True,
    )
    coords_col = oi_configs[-1]["data"]["coords_col"]

    out = {}
    for hp_idx, hp in enumerate(smooth_with_suffix):
        assert hp in smooth_config_dict, f"parameter table {hp} has no smoothing config"
        assert hp in dfs, f"parameter table {hp} not found in {list(dfs)}"
        df = dfs[hp].copy()
        df_org_cols = df.columns.values.tolist()
        smooth_config = smooth_config_dict[hp]
        val_col = params_to_smooth[hp_idx]

        # per unique combination of non-smoothed dims (+_dim_* columns)
        other_dims = [c for c in coords_col if c not in xy_dims]
        other_dims += [c for c in df.columns if re.search(r"^_dim_\d", c)]
        unique_odims = df[other_dims].drop_duplicates()

        smooth_list = []
        for _, row in unique_odims.iterrows():
            row_df = row.to_frame().T.merge(df, on=other_dims, how="inner")
            x0 = row_df[x_col].values.astype(float)
            y0 = row_df[y_col].values.astype(float)
            vals = row_df[val_col].values.astype(float)
            if smooth_config.get("max") is not None:
                vals = np.minimum(vals, smooth_config["max"])
            if smooth_config.get("min") is not None:
                vals = np.maximum(vals, smooth_config["min"])
            row_df[val_col] = gaussian_2d_weight(
                x0, y0, x0, y0, smooth_config["l_x"], smooth_config["l_y"], vals
            )
            tmp = row_df[[val_col, x_col, y_col]].copy()
            tmp.dropna(inplace=True)
            for od in other_dims:
                tmp[od] = row[od]
            smooth_list.append(tmp[df_org_cols])

        smooth_df = pd.concat(smooth_list)
        smooth_df.set_index(coords_col, inplace=True)
        out_table = f"{hp}{table_suffix}"
        cprint(f"adding smoothed table: {out_table}", c="OKCYAN")
        out[out_table] = smooth_df
        smooth_config_dict[out_table] = smooth_config

    for param in other_with_suffix:
        out_table = f"{param}{table_suffix}"
        if param in dfs:
            cprint(f"copying table: {param} to {out_table}", c="OKCYAN")
            out[out_table] = dfs[param].copy().set_index(coords_col)
        else:
            cprint(f"{param} not found, skipping", c="FAIL")

    output_file = result_file if output_file is None else output_file
    with TableStore(output_file) as store:
        for k, v in out.items():
            store.put(k, v, replace=True)
            sc = smooth_config_dict.get(k)
            store.put_attrs(
                k,
                smooth_config=(
                    dataclasses.asdict(sc)
                    if sc is not None
                    else {"comment": f"no smoothing, copied directly from {re.sub(f'{table_suffix}$', '', k)}"}
                ),
            )

    if save_config_file:
        out_config = re.sub(r"\.h5$", f"{reference_table_suffix}{table_suffix}.json", result_file)
        tmp = []
        for oic in oi_configs:
            run_kwargs = oic.get("run_kwargs", {})
            run_kwargs["optimise"] = False
            run_kwargs["table_suffix"] = f"{reference_table_suffix}{table_suffix}"
            run_kwargs["store_path"] = output_file
            model = oic["model"]
            model["load_params"] = {
                "file": output_file,
                "table_suffix": f"{reference_table_suffix}{table_suffix}",
            }
            oic["run_kwargs"] = run_kwargs
            oic["model"] = model
            tmp.append(json_serializable(oic))
        cprint(f"writing predict-only config to:\n{out_config}", c="OKBLUE")
        with open(out_config, "w") as f:
            json.dump(tmp, f, indent=4)
        return out_config


# --------------------------------------------------------------------------
# prediction gluing (ref: postprocessing.py:447-577)
# --------------------------------------------------------------------------

def glue_local_predictions_1d(
    preds_df: pd.DataFrame,
    pred_loc_col: str,
    xprt_loc_col: str,
    vars_to_glue: Union[str, List[str]],
    inference_radius: Union[int, float, dict],
    R: float = 3,
) -> pd.DataFrame:
    """Gaussian-weighted average of overlapping 1-d expert predictions."""
    from scipy.stats import norm

    if isinstance(vars_to_glue, str):
        vars_to_glue = [vars_to_glue]
    preds = preds_df.copy(deep=True)

    if isinstance(inference_radius, dict):
        assert len(inference_radius) == len(preds[xprt_loc_col].unique())
        inference_radius = np.array([inference_radius[loc] for loc in preds[xprt_loc_col]])

    preds["weights"] = norm.pdf(preds[pred_loc_col], preds[xprt_loc_col], inference_radius / R)
    preds["total_weights"] = preds["weights"]
    for var in vars_to_glue:
        preds[var] = preds[var] * preds["weights"]
    glued = preds[[pred_loc_col, "total_weights"] + vars_to_glue].groupby([pred_loc_col]).sum().reset_index()
    for var in vars_to_glue:
        glued[var] = glued[var] / glued["total_weights"]
    return glued.drop("total_weights", axis=1)


def glue_local_predictions_2d(
    preds_df: pd.DataFrame,
    pred_loc_cols: List[str],
    xprt_loc_cols: List[str],
    vars_to_glue: Union[str, List[str]],
    inference_radius: Union[int, float],
    R: float = 3,
) -> pd.DataFrame:
    """Gaussian-weighted average of overlapping 2-d expert predictions
    (separable per-axis normal weights, matching the reference)."""
    from scipy.stats import norm

    if isinstance(vars_to_glue, str):
        vars_to_glue = [vars_to_glue]
    preds = preds_df.copy(deep=True)

    preds["total_weights"] = 1.0
    for pred_col, xprt_col in zip(pred_loc_cols, xprt_loc_cols):
        preds["total_weights"] = preds["total_weights"] * norm.pdf(
            preds[pred_col], preds[xprt_col], inference_radius / R
        )
    for var in vars_to_glue:
        preds[var] = preds[var] * preds["total_weights"]
    glued = preds[pred_loc_cols + ["total_weights"] + vars_to_glue].groupby(pred_loc_cols).sum().reset_index()
    for var in vars_to_glue:
        glued[var] = glued[var] / glued["total_weights"]
    return glued.drop("total_weights", axis=1)


def glue_local_predictions(
    preds_df: pd.DataFrame,
    inference_radius: Union[int, float],
    R: float = 3,
    pred_loc_cols: List[str] = ["pred_loc_x", "pred_loc_y"],
    xprt_loc_cols: List[str] = ["x", "y"],
    vars_to_glue: Optional[List[str]] = None,
) -> pd.DataFrame:
    """Convenience wrapper with the standard preds-table column names.

    ``f*`` follows the reference schema (gpflow_models.py:236-271): it is
    the DE-MEANED posterior, with the subtracted per-expert mean stored as
    ``f_bar``. By default ``f_bar`` is glued too (when present) so callers
    can reconstruct the physical field as ``f* + f_bar``.
    """
    if vars_to_glue is None:
        vars_to_glue = ["f*", "f*_var", "y_var"]
        if "f_bar" in preds_df.columns:
            vars_to_glue.append("f_bar")
    return glue_local_predictions_2d(
        preds_df, pred_loc_cols, xprt_loc_cols, vars_to_glue, inference_radius, R
    )
