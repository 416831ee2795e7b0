"""Functional model cores — the jit/vmap-able heart of each model.

A ModelCore bundles the pure functions the batched engine needs:
objective (to minimize), predict, the unconstrained<->constrained parameter
maps, and initialization. One core instance describes a model *family* with
fixed hyper-structure (kernel name, bijectors, jitter); per-expert state
lives entirely in the params/data pytrees so everything vmaps.

The host-facing classes in gpsat_tpu.models.* wrap these same cores with
the reference's single-expert BaseGPRModel contract.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from gpsat_tpu.models import gpr as gpr_core
from gpsat_tpu.ops import transforms as T


@dataclasses.dataclass(frozen=True)
class ModelCore:
    name: str
    objective: Callable  # (uparams, data) -> scalar loss (minimized)
    predict: Callable  # (cparams, data, Xnew) -> {"f_mean", "f_var", "y_var"}
    forward: Callable  # uparams -> cparams
    inverse: Callable  # cparams -> uparams
    init_cparams: Callable  # (D, dtype, overrides) -> cparams (unbatched)
    param_names: tuple
    # params held fixed during optimization unless explicitly trained
    # (e.g. SGPR inducing points, ref: gpflow_models.py:896-897)
    default_fixed_params: tuple = ()
    # optional hook: (TileBatch, init_cparams) -> init_cparams with
    # per-expert [B, ...] entries (e.g. per-tile inducing point init)
    prepare_batch_init: Callable = None
    # optional hook running INSIDE the jitted program, per tile, before
    # optimization: (uparams0, data) -> uparams0. Used for data-dependent
    # warm starts that need the model's own math (e.g. SVGP's closed-form
    # collapsed q given the initial hyperparameters). Only applied when
    # optimise=True — predict-only runs must honor loaded params verbatim.
    device_init: Callable = None
    # optional hook applied after optimization, before predict/param
    # extraction: (cparams, data) -> cparams. Used for parameters that are
    # a closed-form function of the optimized ones (e.g. the collapsed
    # SVGP q given the final hyperparameters). Applied only when
    # optimise=True (same predict-only contract as device_init).
    finalize_params: Callable = None
    # which batched runner fits this core: 'lbfgs' (deterministic
    # objectives) or 'adam' (stochastic, e.g. SVGP)
    optimizer: str = "lbfgs"
    # optional natural-gradient hook for variational params (SVGP): the
    # Adam runner calls natgrad_update(uparams, data) each iteration and
    # it returns new values for natgrad_params, which are excluded from
    # the Adam update (ref: gpflow_models.py:1186-1212 hybrid optimizer)
    natgrad_update: Callable = None
    natgrad_params: tuple = ()


def make_gpr_core(
    kernel: str = "Matern32",
    bijectors: Optional[dict] = None,
    jitter: float = 0.0,
    mean_function: Optional[str] = None,
) -> ModelCore:
    """Exact GPR core (objective = negative log marginal likelihood).

    mean_function "Constant"/"Linear" adds trainable per-expert prior-mean
    params mean_c (+ mean_A [D] for Linear), identity bijectors
    (ref: gpflow_models.py:143-157; gpsat_tpu.models.means).
    """
    from gpsat_tpu.models import means as MF

    MF.validate(mean_function)
    if bijectors is None:
        bijectors = {name: T.POSITIVE for name in gpr_core.PARAM_NAMES}
    bijectors = dict(bijectors)
    for p in MF.mean_param_names(mean_function):
        bijectors.setdefault(p, T.IDENTITY)

    def objective(uparams, data):
        return gpr_core.neg_lml(uparams, data, kernel=kernel, bijectors=bijectors, jitter=jitter)

    def predict(cparams, data, Xnew):
        return gpr_core.predict(cparams, data, Xnew, kernel=kernel, jitter=jitter)

    def forward(uparams):
        return {k: bijectors[k].forward(v) for k, v in uparams.items()}

    def inverse(cparams):
        return {k: bijectors[k].inverse(jnp.asarray(v)) for k, v in cparams.items()}

    def init_cparams(D: int, dtype=np.float64, overrides: Optional[dict] = None) -> Dict[str, np.ndarray]:
        out = {
            "lengthscales": np.ones((D,), dtype=dtype),
            "kernel_variance": np.asarray(1.0, dtype=dtype),
            "likelihood_variance": np.asarray(1.0, dtype=dtype),
        }
        out.update(MF.mean_param_defaults(mean_function, D, dtype=dtype))
        for k, v in (overrides or {}).items():
            if k not in out:
                continue
            v = np.asarray(v, dtype=dtype)
            out[k] = np.broadcast_to(v, out[k].shape).copy() if v.ndim < np.ndim(out[k]) else v
        return out

    return ModelCore(
        name=f"GPR[{kernel}]",
        objective=objective,
        predict=predict,
        forward=forward,
        inverse=inverse,
        init_cparams=init_cparams,
        param_names=tuple(gpr_core.PARAM_NAMES) + MF.mean_param_names(mean_function),
    )
