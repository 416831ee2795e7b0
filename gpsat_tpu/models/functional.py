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
    # optional objective used for the stored 'objective' diagnostic on
    # predict-only runs (optimise=False), where uparams are the loaded
    # params in the STANDARD parameterization. Cores whose training
    # objective reinterprets a param slot (e.g. the profiled GPR carries
    # tau in the likelihood_variance slot) must set this to the standard
    # objective or the predict-only diagnostic silently reports a value
    # at the wrong parameters. Defaults to `objective`.
    report_objective: Callable = None
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
    profile_variance: bool = False,
) -> ModelCore:
    """Exact GPR core (objective = negative log marginal likelihood).

    mean_function "Constant"/"Linear" adds trainable per-expert prior-mean
    params mean_c (+ mean_A [D] for Linear), identity bijectors
    (ref: gpflow_models.py:143-157; gpsat_tpu.models.means).

    profile_variance=True (EXPERIMENTAL, opt-in) optimizes the
    concentrated LML: the kernel variance is closed-form per evaluation
    and the search runs over (lengthscales, tau = lv/kv) only — identical
    optimum on well-behaved tiles, one fewer dimension, same one-Cholesky
    cost per iteration (+1 Cholesky in finalize). Requires plain POSITIVE
    bijectors on kernel_variance / likelihood_variance.
    Measured: iters max 23 -> 21, mean -2-17% at bench shapes — BUT the
    concentrated surface makes the degenerate pure-noise stationary point
    (lengthscales -> 0) reachable in the first optimizer steps on some
    tiles (~1/8 lanes of the f64 test seed converge there with a worse
    objective; tests/test_gpr_profiled.py pins the behavior). Keep it off
    unless the workload is verified non-degenerate.
    """
    from gpsat_tpu.models import means as MF

    MF.validate(mean_function)
    if bijectors is None:
        bijectors = {name: T.POSITIVE for name in gpr_core.PARAM_NAMES}
    bijectors = dict(bijectors)
    for p in MF.mean_param_names(mean_function):
        bijectors.setdefault(p, T.IDENTITY)

    if profile_variance:
        assert bijectors.get("kernel_variance") is T.POSITIVE and bijectors.get("likelihood_variance") is T.POSITIVE, (
            "profile_variance requires unconstrained-positive kernel/likelihood "
            "variances (interval constraints change the feasible set of the "
            "profiled parameterization) — drop the constraints or use the joint path"
        )
        return _make_profiled_gpr_core(kernel, bijectors, jitter, mean_function)

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


def _make_profiled_gpr_core(kernel, bijectors, jitter, mean_function) -> ModelCore:
    """Concentrated-LML GPR core (see make_gpr_core(profile_variance=True)).

    Internally the 'likelihood_variance' parameter slot carries
    tau = lv/kv during optimization; kernel_variance is held fixed
    (ignored by the objective). device_init maps the caller's (kv0, lv0)
    init to tau0; finalize_params computes sigma2_hat once at the optimum
    and restores true (kernel_variance, likelihood_variance), so stored
    tables / predictions are in the standard parameterization.
    """
    import dataclasses

    from gpsat_tpu.models import means as MF

    base = make_gpr_core(kernel=kernel, bijectors=bijectors, jitter=jitter,
                         mean_function=mean_function, profile_variance=False)

    def objective(uparams, data):
        return gpr_core.neg_lml_profiled(uparams, data, kernel=kernel, bijectors=bijectors, jitter=jitter)

    def device_init(uparams0, data):
        kv = bijectors["kernel_variance"].forward(uparams0["kernel_variance"])
        lv = bijectors["likelihood_variance"].forward(uparams0["likelihood_variance"])
        out = dict(uparams0)
        out["likelihood_variance"] = bijectors["likelihood_variance"].inverse(lv / kv)
        return out

    def finalize_params(cparams, data):
        tau = cparams["likelihood_variance"]
        sig2 = gpr_core.profiled_sigma2_hat(cparams, data, kernel=kernel, jitter=jitter)
        out = dict(cparams)
        out["kernel_variance"] = sig2
        out["likelihood_variance"] = tau * sig2
        return out

    return dataclasses.replace(
        base,
        name=f"GPR[{kernel},profiled]",
        objective=objective,
        default_fixed_params=("kernel_variance",),
        device_init=device_init,
        finalize_params=finalize_params,
        # predict-only runs load standard (kv, lv) params; evaluate the
        # joint neg-LML there, NOT the profiled objective (which would
        # read the lv slot as tau and ignore kv)
        report_objective=base.objective,
    )
