"""Host-facing base model API — contract-compatible with the reference.

Mirrors ``BaseGPRModel`` (ref: GPSat/models/base_model.py:17-448): data
ingestion from a DataFrame or raw arrays, coordinate/observation rescaling,
optional 'local' de-meaning, and the reflection-based parameter API where
every name in ``param_names`` has ``get_*``/``set_*`` (and optionally
``set_*_constraints``) methods.

These classes are the single-expert convenience surface; the batched TPU
execution path (gpsat_tpu.experts) calls the functional cores directly and
never constructs one object per expert.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd


class BaseGPRModel(ABC):
    """Abstract base for all local-expert GP models.

    Subclasses must implement ``predict``, ``optimise_parameters``,
    ``param_names``, ``get_objective_function_value`` and provide
    ``get_<p>``/``set_<p>`` for each parameter name.
    """

    def __init__(
        self,
        data: Optional[pd.DataFrame] = None,
        coords_col: Union[str, List[str], None] = None,
        obs_col: Union[str, List[str], None] = None,
        coords: Optional[np.ndarray] = None,
        obs: Optional[np.ndarray] = None,
        coords_scale=None,
        obs_scale=None,
        obs_mean=None,
        verbose: bool = False,
        **kwargs,
    ):
        if data is not None:
            assert coords_col is not None, "data was provided, but coords_col was not"
            assert obs_col is not None, "data was provided, but obs_col was not"
            if isinstance(coords_col, str):
                coords_col = [coords_col]
            if isinstance(obs_col, str):
                obs_col = [obs_col]
            self.obs = data.loc[:, obs_col].values
            self.coords = data.loc[:, coords_col].values
            self.obs_col = obs_col
            self.coords_col = coords_col
        else:
            assert obs is not None and coords is not None, "provide either data or (coords, obs)"
            obs = np.asarray(obs)
            coords = np.asarray(coords)
            if obs.ndim == 1:
                obs = obs[:, None]
            if coords.ndim == 1:
                coords = coords[:, None]
            assert len(obs) == len(coords), "obs and coords lengths don't match"
            self.obs = obs
            self.coords = coords
            self.coords_col = coords_col if coords_col is not None else list(range(coords.shape[1]))
            self.obs_col = obs_col if obs_col is not None else [0]

        assert not np.isnan(self.coords).any(), "nans found in coords"
        assert not np.isnan(self.obs).any(), "nans found in obs"

        # de-meaning: 'local' => subtract per-tile mean (ref: base_model.py:191-209)
        if obs_mean == "local":
            obs_mean = np.mean(self.obs, axis=0, keepdims=True)
        elif obs_mean is None:
            obs_mean = np.zeros((1, 1))
        elif isinstance(obs_mean, list):
            obs_mean = np.array(obs_mean, dtype=float)[None, :]
        elif isinstance(obs_mean, (int, float)):
            obs_mean = np.array([[float(obs_mean)]])
        self.obs_mean = obs_mean

        def _as_scale(s):
            if s is None:
                return np.atleast_2d(1.0)
            if isinstance(s, list):
                return np.array(s, dtype=float)[None, :]
            if isinstance(s, (int, float)):
                return np.array([[float(s)]])
            return np.atleast_2d(np.asarray(s, dtype=float))

        self.obs_scale = _as_scale(obs_scale)
        self.coords_scale = _as_scale(coords_scale)

        self.coords = self.coords.astype(float) / self.coords_scale
        self.obs = (self.obs.astype(float) - self.obs_mean) / self.obs_scale

        self.gpu_name, self.cpu_name = self._get_device_names()

        # enforce the reflection contract up front
        for pn in self.param_names:
            assert " " not in pn, f"param_name: '{pn}' contains a space"
            getattr(self, f"set_{pn}")
            getattr(self, f"get_{pn}")

    @staticmethod
    def _get_device_names():
        import jax

        accel = None
        cpu = "cpu"
        try:
            for d in jax.devices():
                if d.platform != "cpu":
                    accel = str(d.device_kind)
                    break
        except Exception:
            pass
        return accel, cpu

    # --- abstract contract -------------------------------------------------
    @abstractmethod
    def predict(self, coords: np.ndarray) -> Dict[str, np.ndarray]:
        ...

    @abstractmethod
    def optimise_parameters(self):
        ...

    @property
    @abstractmethod
    def param_names(self) -> List[str]:
        ...

    @abstractmethod
    def get_objective_function_value(self):
        ...

    # --- mean-function params (gpsat_tpu.models.means; shared by every
    # subclass that registers mean_c / mean_A in self._params) -------------
    def get_mean_c(self) -> float:
        return float(self._params["mean_c"])

    def set_mean_c(self, mean_c):
        self._params["mean_c"] = np.asarray(float(np.ravel(mean_c)[0]))

    def get_mean_A(self) -> np.ndarray:
        return np.asarray(self._params["mean_A"])

    def set_mean_A(self, mean_A):
        self._params["mean_A"] = np.asarray(mean_A, dtype=float).reshape(self.coords.shape[1])

    # --- reflection-based parameter API ------------------------------------
    def get_parameters(self, *args, return_dict: bool = True):
        if len(args) == 0:
            args = self.param_names
        for a in args:
            assert a in self.param_names, f"cannot get parameter: {a}; not in {self.param_names}"
        if return_dict:
            return {a: getattr(self, f"get_{a}")() for a in args}
        return [getattr(self, f"get_{a}")() for a in args]


    @staticmethod
    def _attach_full_cov(out: dict, f_cov, likelihood_variance: float) -> dict:
        """Reference full_cov output schema: f*_cov plus y_cov = f_cov with
        the likelihood variance added to the diagonal
        (ref: GPSat/models/gpflow_models.py:244-260)."""
        f_cov = np.asarray(f_cov)
        out["f*_cov"] = f_cov
        y_cov = f_cov.copy()
        np.fill_diagonal(y_cov, np.diag(y_cov) + float(likelihood_variance))
        out["y_cov"] = y_cov
        return out

    def set_parameters(self, **kwargs):
        for k, v in kwargs.items():
            assert k in self.param_names, f"cannot set parameter: {k}; not in {self.param_names}"
            getattr(self, f"set_{k}")(v)

    def set_parameter_constraints(self, constraints_dict: dict, **kwargs):
        for k, v in constraints_dict.items():
            assert k in self.param_names, f"cannot constrain parameter: {k}; not in {self.param_names}"
            getattr(self, f"set_{k}_constraints")(**v, **kwargs)

    # ----- sigmoid-interval constraints, shared by the JAX-core models
    # (GPR/ASVGP/VFF each keep params in self._params with a bijector per
    # name in self._bijectors); ref: gpflow_models.py:416-494 -----
    def _set_constraint(self, name, low, high, move_within_tol=True, tol=1e-8, scale=False, scale_magnitude=None):
        from gpsat_tpu.ops import transforms as T

        cur = np.atleast_1d(np.asarray(self._params[name], dtype=float))
        low = np.broadcast_to(np.atleast_1d(np.asarray(low, dtype=float)), cur.shape).copy()
        high = np.broadcast_to(np.atleast_1d(np.asarray(high, dtype=float)), cur.shape).copy()
        assert np.all(low <= high), "all high-constraint values must be >= low"
        if scale:
            mag = self.coords_scale[0, :] if scale_magnitude is None else scale_magnitude
            low, high = low / mag, high / mag
        if move_within_tol:
            cur = T.move_within_tol(cur, low, high, tol=tol)
        if np.asarray(self._params[name]).ndim == 0:
            self._params[name] = np.asarray(cur[0])
            self._bijectors[name] = T.interval(low[0], high[0])
        else:
            self._params[name] = cur
            self._bijectors[name] = T.interval(low, high)

    def set_lengthscales_constraints(self, low, high, **kw):
        self._set_constraint("lengthscales", low, high, **kw)

    def set_kernel_variance_constraints(self, low, high, **kw):
        self._set_constraint("kernel_variance", low, high, **kw)

    def set_likelihood_variance_constraints(self, low, high, **kw):
        self._set_constraint("likelihood_variance", low, high, **kw)
