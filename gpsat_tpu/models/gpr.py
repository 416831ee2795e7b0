"""Exact Gaussian-process regression — functional core + host-facing model.

The functional core (``neg_lml``, ``predict``) is pure jnp on padded tiles
and is what the batched expert engine vmaps/shards. The ``GPRModel`` class
wraps it with the reference's single-expert contract
(ref: GPSat/models/gpflow_models.py:26-663 — GPflowGPRModel): param names
``lengthscales, kernel_variance, likelihood_variance``; predict returns the
``{"f*", "f*_var", "y_var", "f_bar"}`` dict (plus ``f*_cov``/``y_cov`` when
``full_cov=True``, gpflow_models.py:236-272); constraints are Sigmoid
bijector reparameterizations (gpflow_models.py:416-494); optimization is
L-BFGS to the same pgtol/factr tolerances as scipy's (gpflow_models.py:317-321).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpsat_tpu.models.base import BaseGPRModel
from gpsat_tpu.ops import kernels as K
from gpsat_tpu.ops import linalg as LA
from gpsat_tpu.ops import transforms as T
from gpsat_tpu.optim.lbfgs import minimize_lbfgs

PARAM_NAMES = ["lengthscales", "kernel_variance", "likelihood_variance"]


# --------------------------------------------------------------------------
# functional core (single padded tile; vmap for batches)
# --------------------------------------------------------------------------

def neg_lml(uparams: dict, data: dict, *, kernel: str, bijectors: dict, jitter: float = 0.0):
    """Negative log marginal likelihood on a padded tile.

    uparams: unconstrained {"lengthscales": [D], "kernel_variance": [],
    "likelihood_variance": []}; data: {"X": [N,D], "y": [N], "mask": [N]}.

    On the f32 fast path the analytic-gradient fused form is used (no
    triangular solves, custom_vjp — ops/fused_lml.py); f64 keeps the
    autodiffed Cholesky/solve form for reference parity.
    """
    p = T.forward_params(uparams, bijectors)
    # trainable prior mean (reference mean_function Constant/Linear,
    # gpflow_models.py:143-157): the LML acts on centered obs; the fused
    # path's analytic y-cotangent carries d/d(mean params)
    from gpsat_tpu.models import means as MF

    data = MF.center_y(p, data)
    if LA.use_fast_inverse(data["X"].dtype) and kernel in (
        "Matern12",
        "Matern32",
        "Matern52",
        "RBF",
        "SquaredExponential",
        "Exponential",
    ):
        from gpsat_tpu.ops.fused_lml import masked_gpr_lml_fused

        return -masked_gpr_lml_fused(
            kernel,
            data["X"],
            data["y"],
            data["mask"],
            p["lengthscales"],
            p["kernel_variance"],
            p["likelihood_variance"],
            jnp.asarray(jitter, dtype=data["X"].dtype),
        )
    return -LA.masked_gpr_lml(
        data["X"],
        data["y"],
        data["mask"],
        p["lengthscales"],
        p["kernel_variance"],
        p["likelihood_variance"],
        kernel=kernel,
        jitter=jitter,
    )


def neg_lml_profiled(uparams: dict, data: dict, *, kernel: str, bijectors: dict, jitter: float = 0.0):
    """Profiled (concentrated) negative LML: the kernel variance is solved
    in closed form each evaluation (sigma2_hat = y^T A^-1 y / n with
    A = k_unit + tau*I), so the optimizer searches one fewer dimension.

    The 'likelihood_variance' slot of uparams holds tau = lv/kv; the
    'kernel_variance' slot is ignored (held fixed by the core). Identical
    optimum to neg_lml over (ls, kv, lv) — see profiled_finalize for the
    mapping back. Measured at bench shapes (B=128, N=512, f32 single_eval):
    iters mean 16.7 -> 16.4, max 23 -> 21.
    """
    p = T.forward_params(uparams, bijectors)
    from gpsat_tpu.models import means as MF

    data = MF.center_y(p, data)
    tau = p["likelihood_variance"]
    if LA.use_fast_inverse(data["X"].dtype) and kernel in (
        "Matern12",
        "Matern32",
        "Matern52",
        "RBF",
        "SquaredExponential",
        "Exponential",
    ):
        from gpsat_tpu.ops.fused_lml import masked_gpr_lml_profiled

        return -masked_gpr_lml_profiled(
            kernel,
            data["X"],
            data["y"],
            data["mask"],
            p["lengthscales"],
            tau,
            jnp.asarray(jitter, dtype=data["X"].dtype),
        )
    # f64 reference path (autodiff gradients)
    m = data["mask"].astype(data["X"].dtype)
    n = jnp.sum(m)
    one = jnp.asarray(1.0, dtype=data["X"].dtype)
    A = LA.add_diag(K.gram(kernel, data["X"], data["X"], p["lengthscales"], one), tau + jitter)
    Am = LA.mask_gram(A, m)
    L = LA.cholesky(Am)
    v = LA.tri_solve(L, (data["y"] * m)[:, None])
    # all-masked lanes (batch padding): finite 0 objective, not 0/0
    empty = n == 0
    sig2 = jnp.where(empty, one, jnp.sum(v * v) / jnp.maximum(n, one))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    lml = jnp.where(
        empty,
        jnp.zeros_like(sig2),
        -0.5 * n * (1.0 + jnp.log(sig2)) - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi),
    )
    return -lml


def profiled_sigma2_hat(cparams: dict, data: dict, *, kernel: str, jitter: float = 0.0):
    """sigma2_hat at cparams whose 'likelihood_variance' slot holds tau."""
    from gpsat_tpu.models import means as MF
    from gpsat_tpu.ops.fused_lml import profiled_sigma2

    data = MF.center_y(cparams, data)
    return profiled_sigma2(
        kernel,
        data["X"],
        data["y"],
        data["mask"],
        cparams["lengthscales"],
        cparams["likelihood_variance"],
        jnp.asarray(jitter, dtype=data["X"].dtype),
    )


def posterior_factors(cparams: dict, data: dict, *, kernel: str, jitter: float = 0.0):
    """Factor pair for a fitted tile: (L, alpha, W) where alpha = K^-1 y and
    W = L^-1 on the float32 fast path (None on the f64 solve path)."""
    import jax

    m = data["mask"].astype(data["X"].dtype)
    Kf = K.gram(kernel, data["X"], data["X"], cparams["lengthscales"], cparams["kernel_variance"])
    Kn = LA.add_diag(Kf, cparams["likelihood_variance"] + jitter)
    Km = LA.mask_gram(Kn, m)
    ym = (data["y"] * m)[:, None]
    if LA.use_fast_inverse(Km.dtype):
        if LA.block_path_enabled(Km) or LA.recursive_pair_enabled(Km):
            L, W = LA.chol_winv_pair(Km)  # fused diag-block / recursive path
        else:
            L = LA.cholesky(Km)
            W = LA.tri_inv_blocked(L)
        alpha = jnp.matmul(
            W.T, jnp.matmul(W, ym, precision=jax.lax.Precision.HIGHEST), precision=jax.lax.Precision.HIGHEST
        )
    else:
        L = LA.cholesky(Km)
        W = None
        alpha = LA.cho_solve(L, ym)
    return L, alpha, W


def predict(
    cparams: dict,
    data: dict,
    Xnew: jnp.ndarray,
    *,
    kernel: str,
    jitter: float = 0.0,
    full_cov: bool = False,
):
    """Posterior mean/variance at Xnew (already coords_scale'd).

    Returns dict with f_mean [P], f_var [P], y_var [P] (and f_cov [P,P] when
    full_cov). Padded training rows contribute nothing (zeroed cross-gram).
    """
    import jax

    from gpsat_tpu.models import means as MF

    m = data["mask"].astype(Xnew.dtype)
    data = MF.center_y(cparams, data)
    L, alpha, W = posterior_factors(cparams, data, kernel=kernel, jitter=jitter)
    Ks = K.gram(kernel, data["X"], Xnew, cparams["lengthscales"], cparams["kernel_variance"])
    Ks = Ks * m[:, None]
    f_mean = MF.add_mean(cparams, Xnew, (Ks.T @ alpha)[:, 0])
    v = (
        jnp.matmul(W, Ks, precision=jax.lax.Precision.HIGHEST)
        if W is not None
        else LA.tri_solve(L, Ks)
    )
    kss_diag = K.gram_diag(kernel, Xnew, cparams["kernel_variance"])
    f_var = kss_diag - jnp.sum(v * v, axis=0)
    out = {
        "f_mean": f_mean,
        "f_var": f_var,
        "y_var": f_var + cparams["likelihood_variance"],
    }
    if full_cov:
        Kss = K.gram(kernel, Xnew, Xnew, cparams["lengthscales"], cparams["kernel_variance"])
        out["f_cov"] = Kss - v.T @ v
    return out


def default_init_params(D: int, dtype=jnp.float64) -> dict:
    """gpflow defaults: unit lengthscales/variances (gpflow_models.py:129-135)."""
    return {
        "lengthscales": jnp.ones((D,), dtype=dtype),
        "kernel_variance": jnp.asarray(1.0, dtype=dtype),
        "likelihood_variance": jnp.asarray(1.0, dtype=dtype),
    }


# --------------------------------------------------------------------------
# host-facing single-expert model
# --------------------------------------------------------------------------

class GPRModel(BaseGPRModel):
    """Exact GPR local-expert model (TPU-native analogue of GPflowGPRModel)."""

    def __init__(
        self,
        data=None,
        coords_col=None,
        obs_col=None,
        coords=None,
        obs=None,
        coords_scale=None,
        obs_scale=None,
        obs_mean=None,
        verbose: bool = False,
        *,
        kernel: str = "Matern32",
        kernel_kwargs: Optional[dict] = None,
        noise_variance: Optional[float] = None,
        jitter: float = 0.0,
        **kwargs,
    ):
        super().__init__(
            data=data,
            coords_col=coords_col,
            obs_col=obs_col,
            coords=coords,
            obs=obs,
            coords_scale=coords_scale,
            obs_scale=obs_scale,
            obs_mean=obs_mean,
            verbose=verbose,
        )
        # mean functions (ref: gpflow_models.py:143-157): trainable
        # Constant / Linear via gpsat_tpu.models.means
        from gpsat_tpu.models import means as MF

        mean_function = MF.validate(kwargs.pop("mean_function", None))
        mean_func_kwargs = dict(kwargs.pop("mean_func_kwargs", None) or {})
        self.mean_function = mean_function
        assert kernel in K.KERNEL_NAMES, f"kernel: {kernel} not in {K.KERNEL_NAMES}"
        self.kernel = kernel
        self.kernel_kwargs = dict(kernel_kwargs or {})
        self.jitter = jitter

        D = self.coords.shape[1]
        ls = np.asarray(self.kernel_kwargs.pop("lengthscales", np.ones(D)), dtype=float)
        if ls.ndim == 0:
            ls = np.full(D, float(ls))
        self._params = {
            "lengthscales": ls,
            "kernel_variance": np.asarray(float(self.kernel_kwargs.pop("variance", 1.0))),
            "likelihood_variance": np.asarray(
                1.0 if noise_variance is None else float(noise_variance)
            ),
        }
        self._bijectors = {name: T.POSITIVE for name in PARAM_NAMES}
        mean_overrides = MF.resolve_mean_kwargs(mean_func_kwargs, self.mean_function)
        for p, dflt in MF.mean_param_defaults(self.mean_function, D).items():
            override = mean_overrides.get(p)
            self._params[p] = (
                np.reshape(np.asarray(override, dtype=float), dflt.shape) if override is not None else dflt
            )
            self._bijectors[p] = T.IDENTITY
        self._last_opt_result = None

    def update_obs_data(
        self,
        data=None,
        coords_col=None,
        obs_col=None,
        coords=None,
        obs=None,
        coords_scale=None,
        obs_scale=None,
        obs_mean=None,
    ):
        """Swap the observation data in place, keeping the current
        hyperparameters (ref: gpflow_models.py:331-349 — re-runs the base
        data ingestion; args passed through unchanged, so omitted scales
        reset to their defaults exactly as in the reference)."""
        from gpsat_tpu.models.base import BaseGPRModel

        BaseGPRModel.__init__(
            self,
            data=data,
            coords_col=coords_col,
            obs_col=obs_col,
            coords=coords,
            obs=obs,
            coords_scale=coords_scale,
            obs_scale=obs_scale,
            obs_mean=obs_mean,
        )
        assert self.coords.shape[1] == len(self._params["lengthscales"]), (
            "update_obs_data changed the coordinate dimension; rebuild the model instead"
        )

    # ----- data for the functional core -----
    def _data_dict(self):
        X = jnp.asarray(self.coords)
        return {
            "X": X,
            "y": jnp.asarray(self.obs[:, 0]),
            "mask": jnp.ones((X.shape[0],), dtype=X.dtype),
        }

    @property
    def param_names(self) -> List[str]:
        names = list(PARAM_NAMES)
        # (guarded: the base class inspects param_names before _params exists)
        for p in ("mean_c", "mean_A"):
            if p in getattr(self, "_params", {}):
                names.append(p)
        return names

    # (get/set_mean_c and get/set_mean_A inherit from BaseGPRModel)

    # ----- optimise -----
    def optimise_parameters(self, max_iter: int = 10_000, fixed_params=None, **opt_kwargs) -> bool:
        fixed_params = list(fixed_params or [])
        data = self._data_dict()
        bijectors = self._bijectors
        kernel = self.kernel
        jitter = self.jitter

        u_all = {k: bijectors[k].inverse(jnp.asarray(v)) for k, v in self._params.items()}
        u_free = {k: v for k, v in u_all.items() if k not in fixed_params}
        u_fixed = {k: v for k, v in u_all.items() if k in fixed_params}

        def objective(u_free_):
            u = {**u_free_, **u_fixed}
            return neg_lml(u, data, kernel=kernel, bijectors=bijectors, jitter=jitter)

        # dtype-aware tolerance defaults, matching the engine
        # (make_batched_runner): f64-grade thresholds sit below f32
        # arithmetic noise and would report converged=False forever
        if jnp.asarray(data["X"]).dtype == jnp.float32:
            opt_kwargs.setdefault("tol_grad", 1e-3)
            opt_kwargs.setdefault("tol_f", 1e-6)
            opt_kwargs.setdefault("linesearch", "single_eval")
        res = minimize_lbfgs(objective, u_free, max_iter=max_iter, **opt_kwargs)
        u_opt = {**{k: np.asarray(v) for k, v in res.params.items()}, **u_fixed}
        self._params = {k: np.asarray(bijectors[k].forward(jnp.asarray(v))) for k, v in u_opt.items()}
        self._last_opt_result = res
        return bool(np.asarray(res.converged))

    def get_objective_function_value(self) -> float:
        data = self._data_dict()
        u = {k: self._bijectors[k].inverse(jnp.asarray(v)) for k, v in self._params.items()}
        val = neg_lml(u, data, kernel=self.kernel, bijectors=self._bijectors, jitter=self.jitter)
        # reference reports the *negative* lml for GPR (gpflow_models.py:334-337)
        return float(np.asarray(val))

    # ----- predict -----
    def predict(self, coords, full_cov: bool = False, apply_scale: bool = True) -> Dict[str, np.ndarray]:
        import pandas as pd

        if isinstance(coords, (pd.Series, pd.DataFrame)):
            coords = coords[self.coords_col].values if self.coords_col is not None else coords.values
        coords = np.asarray(coords, dtype=float)
        if coords.ndim == 1:
            coords = coords[None, :]
        if apply_scale:
            coords = coords / self.coords_scale

        cparams = {k: jnp.asarray(v) for k, v in self._params.items()}
        pred = predict(
            cparams,
            self._data_dict(),
            jnp.asarray(coords),
            kernel=self.kernel,
            jitter=self.jitter,
            full_cov=full_cov,
        )
        out = {
            "f*": np.asarray(pred["f_mean"]),
            "f*_var": np.asarray(pred["f_var"]),
            "y_var": np.asarray(pred["y_var"]),
        }
        if full_cov:
            self._attach_full_cov(out, pred["f_cov"], self._params["likelihood_variance"])

        f_bar = self.obs_mean[:, 0]
        out["f_bar"] = np.repeat(f_bar, len(out["f*"])) if len(f_bar) != len(out["f*"]) else f_bar
        return out

    # ----- getters / setters (reflection contract) -----
    def get_lengthscales(self) -> np.ndarray:
        return np.asarray(self._params["lengthscales"])

    def get_kernel_variance(self) -> float:
        return float(self._params["kernel_variance"])

    def get_likelihood_variance(self) -> float:
        return float(self._params["likelihood_variance"])

    def set_lengthscales(self, lengthscales):
        ls = np.asarray(lengthscales, dtype=float)
        if ls.ndim == 0:
            ls = np.full(self.coords.shape[1], float(ls))
        self._params["lengthscales"] = ls

    def set_kernel_variance(self, kernel_variance):
        self._params["kernel_variance"] = np.asarray(np.ravel(kernel_variance)[0], dtype=float)

    def set_likelihood_variance(self, likelihood_variance):
        self._params["likelihood_variance"] = np.asarray(np.ravel(likelihood_variance)[0], dtype=float)

    # constraints: sigmoid reparam via BaseGPRModel._set_constraint
    # (ref gpflow_models.py:416-494)
