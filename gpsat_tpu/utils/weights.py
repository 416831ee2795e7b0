"""Distance-weighted combination of overlapping expert predictions.

``get_weighted_values`` reproduces the reference's pivot-based Gaussian
weighting (ref: GPSat/utils.py:2081-2214) but via a vectorized groupby —
the weight is exp(-d^2 / (2 l^2)) on the squared euclidean distance between
``ref_col`` (prediction location) and ``dist_to_col`` (expert location),
normalized per unique reference location.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np
import pandas as pd


def get_weighted_values(
    df: pd.DataFrame,
    ref_col: Union[str, List[str]],
    dist_to_col: Union[str, List[str]],
    val_cols: Union[str, List[str]],
    weight_function: str = "gaussian",
    drop_weight_cols: bool = True,
    **weight_kwargs,
) -> pd.DataFrame:
    ref_col = [ref_col] if isinstance(ref_col, str) else list(ref_col)
    dist_to_col = [dist_to_col] if isinstance(dist_to_col, str) else list(dist_to_col)
    val_cols = [val_cols] if isinstance(val_cols, str) else list(val_cols)

    x0 = df[ref_col].values
    x = df[dist_to_col].values
    assert x0.shape == x.shape, f"ref_col shape {x0.shape} != dist_to_col shape {x.shape}"

    if weight_function == "gaussian":
        d = np.sum((x0 - x) ** 2, axis=1)
        lscale = weight_kwargs.get("lengthscale", None)
        assert lscale is not None, "lengthscale is None, please provide"
        w = np.exp(-(d / lscale**2) / 2.0)
    else:
        raise NotImplementedError(f"weight_function: {weight_function} is not implemented")

    out = []
    for vc in val_cols:
        tmp = df[ref_col + [vc]].copy()
        assert "_w" not in tmp
        tmp["_w"] = w
        tmp[f"w_{vc}"] = w * tmp[vc].values
        agg = pd.pivot_table(tmp, index=ref_col, values=["_w", f"w_{vc}"], aggfunc="sum")
        agg[vc] = agg[f"w_{vc}"] / agg["_w"]
        if drop_weight_cols:
            agg = agg.drop(["_w", f"w_{vc}"], axis=1)
        out.append(agg)

    out = pd.concat(out, axis=1)
    out.reset_index(inplace=True)
    return out
