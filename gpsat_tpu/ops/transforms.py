"""Bijective parameter transforms (constrained <-> unconstrained).

Replaces the reference's TFP ``Sigmoid`` bijector re-wrap
(ref: GPSat/models/gpflow_models.py:592-628) and the numba-vectorized
``softplus``/``inverse_softplus``/``sigmoid``/``inverse_sigmoid``
(ref: GPSat/utils.py:2320-2400) with pure-jnp bijectors that are trivially
vmappable and differentiable, so constraint handling on TPU is a
reparameterization inside the jitted objective rather than a wrapper object.

Optimization runs in unconstrained space; ``forward`` maps to the constrained
(physical) value. GPflow's default positive transform is softplus, which we
mirror so unconstrained optima land in the same place numerically.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def softplus(x: Array) -> Array:
    # log(1 + exp(x)), overflow-safe for large |x|
    return jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(x, 0.0)


def inverse_softplus(y: Array) -> Array:
    # x = log(exp(y) - 1) = y + log(1 - exp(-y)), stable for large/small y
    y = jnp.asarray(y)
    dt = getattr(y, "dtype", None)
    eps_thresh = np.log(np.finfo(dt if dt is not None and np.issubdtype(dt, np.floating) else np.float64).eps) + 2.0
    small = y < jnp.exp(eps_thresh)
    big = y > -eps_thresh
    # clip the argument of expm1 to keep the unused branch NaN-free under where()
    safe = jnp.log(-jnp.expm1(-jnp.clip(y, 1e-300, None))) + y
    out = jnp.where(small, jnp.log(jnp.clip(y, 1e-300, None)), jnp.where(big, y, safe))
    return jnp.where(y <= 0, -jnp.inf, out)


def sigmoid_lh(x: Array, low, high) -> Array:
    """Scaled sigmoid mapping R -> (low, high)."""
    return (high - low) * jnp.reciprocal(1.0 + jnp.exp(-x)) + low


def inverse_sigmoid_lh(y: Array, low, high) -> Array:
    y = jnp.asarray(y)
    inner = (high - low) / (y - low) - 1.0
    out = -jnp.log(inner)
    out = jnp.where(y <= low, -jnp.inf, out)
    out = jnp.where(y >= high, jnp.inf, out)
    return out


@dataclasses.dataclass(frozen=True)
class Bijector:
    """A forward/inverse pair R^n -> constrained domain."""

    name: str = "softplus"
    # bounds used by the sigmoid bijector; arrays broadcast against the param
    low: Union[float, np.ndarray, None] = None
    high: Union[float, np.ndarray, None] = None
    # lower shift for the softplus bijector (gpflow positive_minimum analogue)
    shift: float = 0.0

    def forward(self, x: Array) -> Array:
        if self.name == "softplus":
            return softplus(x) + self.shift
        if self.name == "sigmoid":
            return sigmoid_lh(x, self.low, self.high)
        if self.name == "exp":
            return jnp.exp(x)
        if self.name == "identity":
            return x
        raise ValueError(f"unknown bijector: {self.name}")

    def inverse(self, y: Array) -> Array:
        if self.name == "softplus":
            return inverse_softplus(jnp.asarray(y) - self.shift)
        if self.name == "sigmoid":
            # clamp the UNCONSTRAINED value (not the input) to +-40, past
            # which sigmoid saturates exactly to the bound in f32 and f64 —
            # so forward(inverse(high)) == high bitwise (params stored at a
            # saturated bound round-trip exactly through predict-only
            # reloads), while out-of-range inputs (e.g. data-driven inits)
            # still map to large-but-finite values
            u = inverse_sigmoid_lh(jnp.asarray(y), self.low, self.high)
            return jnp.clip(u, -40.0, 40.0)
        if self.name == "exp":
            return jnp.log(y)
        if self.name == "identity":
            return jnp.asarray(y)
        raise ValueError(f"unknown bijector: {self.name}")


POSITIVE = Bijector("softplus")
IDENTITY = Bijector("identity")


def interval(low, high) -> Bijector:
    """Sigmoid bijector onto (low, high) — the constraint transform the
    reference builds with tfp.bijectors.Sigmoid
    (ref: GPSat/models/gpflow_models.py:488-494)."""
    return Bijector("sigmoid", low=np.asarray(low, dtype=np.float64), high=np.asarray(high, dtype=np.float64))


def forward_params(unconstrained: dict, bijectors: dict) -> dict:
    """Map a dict of unconstrained params to constrained, using per-name
    bijectors (default: positive/softplus)."""
    return {
        k: bijectors.get(k, POSITIVE).forward(v) if bijectors.get(k, POSITIVE) is not None else v
        for k, v in unconstrained.items()
    }


def inverse_params(constrained: dict, bijectors: dict) -> dict:
    return {
        k: bijectors.get(k, POSITIVE).inverse(v) if bijectors.get(k, POSITIVE) is not None else v
        for k, v in constrained.items()
    }


def move_within_tol(vals: np.ndarray, low: np.ndarray, high: np.ndarray, tol: float = 1e-8) -> np.ndarray:
    """Nudge values strictly inside [low+tol, high-tol] before applying a
    sigmoid constraint (ref: GPSat/models/gpflow_models.py:470-479)."""
    vals = np.atleast_1d(np.array(vals, dtype=float, copy=True))
    low = np.broadcast_to(np.asarray(low, dtype=float), vals.shape)
    high = np.broadcast_to(np.asarray(high, dtype=float), vals.shape)
    half_min_width = np.min(high - low) / 2.0
    tol = min(tol, half_min_width)
    vals = np.where(vals > high - tol, high - tol, vals)
    vals = np.where(vals < low + tol, low + tol, vals)
    return vals
