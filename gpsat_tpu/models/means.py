"""Trainable prior mean functions — Constant and Linear, zoo-wide.

The reference accepts any gpflow mean function by string on its models
(ref: GPSat/models/gpflow_models.py:143-157 for GPR, :798 for SGPR; the
SVGP/VFF paths pass mean_function through to gpflow the same way). Two are
meaningful for local-expert OI and implemented here:

  Constant:  m(x) = c                      params: mean_c []
  Linear:    m(x) = A^T x + c              params: mean_A [D], mean_c []

(gpflow's Linear(A, b) with a single output; the intercept is named
mean_c so Constant is the A=0 special case and warm-start files stay
compatible.)

A deterministic prior mean enters EVERY GP variant identically: the
objective acts on the centered observations y - m(X), and predictions add
m(Xnew) back. These helpers implement exactly that, so each model core
needs only two calls (center_y in its objective/common-terms, add_mean in
its predict). Gradients flow through m via the models' y-cotangent (the
fused GPR LML exposes d lml/dy analytically for this purpose —
ops/fused_lml.py gradient contract).

Mean params use identity bijectors (they are unconstrained reals).
"""

from __future__ import annotations

import numpy as np

MEAN_FUNCTIONS = (None, "Constant", "Linear")


def validate(mean_function):
    if mean_function not in MEAN_FUNCTIONS:
        raise NotImplementedError(
            f"mean_function: {mean_function!r} not supported (use None, 'Constant' or 'Linear')"
        )
    return mean_function


def mean_param_names(mean_function) -> tuple:
    if mean_function == "Constant":
        return ("mean_c",)
    if mean_function == "Linear":
        return ("mean_c", "mean_A")
    return ()


def resolve_mean_kwargs(mean_func_kwargs: dict, mean_function) -> dict:
    """mean_func_kwargs -> {internal param name: value}, accepting BOTH
    gpflow spellings of the intercept: Constant(c=...) and Linear(A, b)
    (ref: gpflow mean_functions.py). Unknown keys raise instead of being
    silently dropped."""
    kw = dict(mean_func_kwargs or {})
    out = {}
    for alias in ("c", "b"):
        if alias in kw:
            assert "mean_c" not in out, "pass only one of 'c'/'b' for the intercept"
            out["mean_c"] = kw.pop(alias)
    if "A" in kw:
        out["mean_A"] = kw.pop("A")
    assert not kw, (
        f"unknown mean_func_kwargs keys: {sorted(kw)} "
        "(accepted: 'c' or 'b' for the intercept, 'A' for the Linear slope)"
    )
    allowed = mean_param_names(mean_function)
    bad = [p for p in out if p not in allowed]
    assert not bad, (
        f"mean_func_kwargs {sorted(bad)} not applicable to mean_function={mean_function!r}"
    )
    return out


def mean_param_defaults(mean_function, D: int, dtype=np.float64) -> dict:
    out = {}
    if mean_function in ("Constant", "Linear"):
        out["mean_c"] = np.asarray(0.0, dtype=dtype)
    if mean_function == "Linear":
        out["mean_A"] = np.zeros((D,), dtype=dtype)
    return out


def mean_value(cparams: dict, X):
    """m(X) -> [N] (or scalar 0.0 when no mean params are present)."""
    out = None
    if "mean_c" in cparams:
        out = cparams["mean_c"]
    if "mean_A" in cparams:
        lin = X @ cparams["mean_A"]
        out = lin if out is None else out + lin
    return 0.0 if out is None else out


def has_mean(cparams: dict) -> bool:
    return "mean_c" in cparams or "mean_A" in cparams


def center_y(cparams: dict, data: dict) -> dict:
    """data with y replaced by y - m(X); no-op without mean params.
    Padded rows pick up arbitrary m values — harmless, they are masked."""
    if not has_mean(cparams):
        return data
    return {**data, "y": data["y"] - mean_value(cparams, data["X"])}


def add_mean(cparams: dict, Xnew, f_mean):
    """f_mean + m(Xnew); no-op without mean params."""
    if not has_mean(cparams):
        return f_mean
    return f_mean + mean_value(cparams, Xnew)
