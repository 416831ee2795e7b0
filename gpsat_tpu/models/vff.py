"""Variational Fourier Features (Hensman, Durrande & Solin 2017).

TPU-native analogue of GPflowVFFModel + the vff.py engine (ref:
GPSat/models/vff_model.py:14-267, GPSat/vff.py:381-676, itself adapted
from github.com/st--/VFF). Per-dimension 1-D Matern kernels on a cuboidal
domain [a, b]^D centered on the expert location; inducing *features* are
Fourier basis functions, giving closed-form spectral Kuu matrices:

  Matern12: Kuu = blockdiag(diag(d_cos) + v v^T, diag(d_sin))
  Matern32: Kuu = blockdiag(diag(d_cos) + v v^T, diag(d_sin) + w w^T)
  Matern52: Kuu = blockdiag(diag(d_cos) + W W^T, diag(d_sin) + w w^T)

The reference keeps these as structured-matrix objects
(DiagMat/Rank1Mat/LowRankMat/BlockDiagMat, vff.py:14-377); at VFF's
M ~ tens per dimension a dense representation is both simpler and faster
on TPU (one small Cholesky), so this build materializes Kuu densely and
lets XLA handle it. Kuf cross-covariances include the reference's
outside-domain edge corrections for Matern12/32 (vff.py:457-523);
Matern52 requires in-domain data (same restriction as the reference).

Collapsed ELBO and posterior follow GPR_kron (vff.py:597-676):
  P = Kuf Kfu / s2 + Kuu;  c = L_P^-1 (Kuf y) / s2
  elbo = -ND/2 log(2 pi s2) - D/2 log|P| + D/2 log|Kuu|
         - y^T y/(2 s2) + |c|^2/2 - sum(Kdiag)/(2 s2)
         + sum(Kuu^-1 o KufKfu)/(2 s2)

Cost: O(NM^2) precompute, O(M^3)/iteration, O(NM) memory
(ref: vff_model.py:38).
"""

from __future__ import annotations

from functools import reduce
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gpsat_tpu.models.base import BaseGPRModel
from gpsat_tpu.ops import transforms as T

PARAM_NAMES = ["lengthscales", "kernel_variance", "likelihood_variance"]
SUPPORTED_KERNELS = ("Matern12", "Matern32", "Matern52")


# --------------------------------------------------------------------------
# spectral covariances (vff.py:381-454)
# --------------------------------------------------------------------------

def make_kuu_dense(kernel: str, lengthscale, variance, a: float, b: float, M: int):
    """Dense Kuu [2M-1, 2M-1] for one dimension; cos block then sin block.

    Computed in the parameter dtype: the integer frequency index would
    otherwise promote through the weak-float omegas to f64 under
    jax_enable_x64 (f32-tile + x64-host mixes)."""
    dt = jnp.result_type(lengthscale, variance)
    ms = jnp.arange(M, dtype=dt)
    omegas = 2.0 * jnp.pi * ms / (b - a)
    var = variance

    if kernel == "Matern12":
        lamb = 1.0 / lengthscale
        two_or_four = jnp.where(omegas == 0, 2.0, 4.0)
        d_cos = (b - a) * (lamb**2 + omegas**2) / lamb / var / two_or_four
        v_cos = jnp.ones(M) / jnp.sqrt(var)
        om_s = omegas[1:]
        d_sin = (b - a) * (lamb**2 + om_s**2) / lamb / var / 4.0
        cos_block = jnp.diag(d_cos) + jnp.outer(v_cos, v_cos)
        sin_block = jnp.diag(d_sin)
    elif kernel == "Matern32":
        lamb = jnp.sqrt(3.0) / lengthscale
        four_or_eight = jnp.where(omegas == 0, 4.0, 8.0)
        d_cos = (b - a) * (lamb**2 + omegas**2) ** 2 / lamb**3 / var / four_or_eight
        v_cos = jnp.ones(M) / jnp.sqrt(var)
        om_s = omegas[1:]
        d_sin = (b - a) * (lamb**2 + om_s**2) ** 2 / lamb**3 / var / 8.0
        v_sin = om_s / lamb / jnp.sqrt(var)
        cos_block = jnp.diag(d_cos) + jnp.outer(v_cos, v_cos)
        sin_block = jnp.diag(d_sin) + jnp.outer(v_sin, v_sin)
    elif kernel == "Matern52":
        lamb = jnp.sqrt(5.0) / lengthscale
        sixteen_or_32 = jnp.where(omegas == 0, 16.0, 32.0)
        v1 = (3.0 * (omegas / lamb) ** 2 - 1.0) / jnp.sqrt(8.0 * var)
        v2 = jnp.ones(M) / jnp.sqrt(var)
        W = jnp.stack([v1, v2], axis=1)  # [M, 2]
        d_cos = 3.0 * (b - a) / sixteen_or_32 / lamb**5 / var * (lamb**2 + omegas**2) ** 3
        om_s = omegas[1:]
        v_sin = jnp.sqrt(3.0) * om_s / lamb / jnp.sqrt(var)
        d_sin = 3.0 * (b - a) / 32.0 / lamb**5 / var * (lamb**2 + om_s**2) ** 3
        cos_block = jnp.diag(d_cos) + W @ W.T
        sin_block = jnp.diag(d_sin) + jnp.outer(v_sin, v_sin)
    else:
        raise NotImplementedError(f"VFF supports {SUPPORTED_KERNELS}, got: {kernel}")

    Z = jnp.zeros((cos_block.shape[0], sin_block.shape[0]), dtype=dt)
    return jnp.block([[cos_block, Z], [Z.T, sin_block]]).astype(dt)


def make_kuf(kernel: str, lengthscale, X1d, a: float, b: float, M: int):
    """Kuf [2M-1, N] for one dimension with edge corrections outside [a,b]
    (vff.py:457-523). X1d: [N] (already scaled coordinates)."""
    dt = jnp.result_type(lengthscale, X1d)
    ms = jnp.arange(M, dtype=dt)
    omegas = 2.0 * jnp.pi * ms / (b - a)
    x = X1d.reshape(-1)
    Kuf_cos = jnp.cos(omegas[:, None] * (x[None, :] - a))
    om_s = omegas[1:]
    Kuf_sin = jnp.sin(om_s[:, None] * (x[None, :] - a))

    lt_a = (x < a)[None, :]
    gt_b = (x > b)[None, :]
    if kernel == "Matern12":
        Kuf_sin = jnp.where(jnp.logical_or(lt_a, gt_b), 0.0, Kuf_sin)
        edge_a = jnp.exp(-jnp.abs(x - a) / lengthscale)[None, :]
        edge_b = jnp.exp(-jnp.abs(x - b) / lengthscale)[None, :]
        Kuf_cos = jnp.where(lt_a, edge_a, Kuf_cos)
        Kuf_cos = jnp.where(gt_b, edge_b, Kuf_cos)
    elif kernel == "Matern32":
        arg_a = jnp.sqrt(3.0) * jnp.abs(x - a) / lengthscale
        arg_b = jnp.sqrt(3.0) * jnp.abs(x - b) / lengthscale
        Kuf_cos = jnp.where(lt_a, ((1 + arg_a) * jnp.exp(-arg_a))[None, :], Kuf_cos)
        Kuf_cos = jnp.where(gt_b, ((1 + arg_b) * jnp.exp(-arg_b))[None, :], Kuf_cos)
        edge_sa = (x - a)[None, :] * jnp.exp(-arg_a)[None, :] * om_s[:, None]
        edge_sb = (x - b)[None, :] * jnp.exp(-arg_b)[None, :] * om_s[:, None]
        Kuf_sin = jnp.where(lt_a, edge_sa, Kuf_sin)
        Kuf_sin = jnp.where(gt_b, edge_sb, Kuf_sin)
    elif kernel == "Matern52":
        # edge corrections not implemented (parity with reference:
        # vff.py:503-517, which hard-fails on out-of-domain X). Callers must
        # keep X inside [a, b]: the host model raises on out-of-domain
        # prediction points and the batched core grows its per-tile domain
        # to cover them — outside [a, b] these cos/sin columns are the
        # (wrong) periodic extension.
        pass
    else:
        raise NotImplementedError(f"VFF supports {SUPPORTED_KERNELS}, got: {kernel}")
    return jnp.concatenate([Kuf_cos, Kuf_sin], axis=0).astype(dt)


def make_kvs(mats: List[jnp.ndarray]) -> jnp.ndarray:
    """Column-wise Khatri-Rao ('kronecker-vector stack', vff.py:540-559):
    [Ma, N] x [Mb, N] -> [Ma*Mb, N]."""

    def two(A, B):
        return jnp.repeat(A, B.shape[0], axis=0) * jnp.tile(B, (A.shape[0], 1))

    return reduce(two, mats)


def kron(mats: List[jnp.ndarray]) -> jnp.ndarray:
    return reduce(jnp.kron, mats)


def _matern_kdiag(kernel: str, variance, n):
    return variance * jnp.ones(n)


def _per_dim_params(cparams: dict, D: int):
    """Split joint params into per-dim 1-D kernel params: the joint kernel
    variance is shared as var^(1/D) per dimension (ref: vff_model.py:227-240)."""
    ls = cparams["lengthscales"].reshape(D)
    var_d = cparams["kernel_variance"] ** (1.0 / D)
    return ls, var_d


def vff_common(cparams: dict, data: dict, *, kernel: str, a, b, M: int):
    """Shared factors for elbo/predict on one padded tile."""
    from gpsat_tpu.models import means as MF

    X, y, m = data["X"], data["y"], data["mask"].astype(data["X"].dtype)
    # trainable prior mean (Constant/Linear): bound on centered obs
    y = y - MF.mean_value(cparams, X) if MF.has_mean(cparams) else y
    D = X.shape[1]
    ls, var_d = _per_dim_params(cparams, D)
    s2 = cparams["likelihood_variance"]

    Kuf_dims = [make_kuf(kernel, ls[i], X[:, i], a[i], b[i], M) for i in range(D)]
    Kuf = make_kvs(Kuf_dims) * m[None, :]
    ym = y * m
    KufY = Kuf @ ym[:, None]
    KufKfu = Kuf @ Kuf.T

    Kuu_dims = [make_kuu_dense(kernel, ls[i], var_d, a[i], b[i], M) for i in range(D)]
    Kuu = kron(Kuu_dims)
    Kuu_inv = kron([jnp.linalg.inv(Kd) for Kd in Kuu_dims])

    Mtot = Kuu.shape[0]
    Ms = [Kd.shape[0] for Kd in Kuu_dims]
    logdets = [jnp.linalg.slogdet(Kd)[1] for Kd in Kuu_dims]
    Kuu_logdet = sum((Mtot / Ms[i]) * logdets[i] for i in range(D))

    P = KufKfu / s2 + Kuu
    from gpsat_tpu.ops import linalg as LA

    if LA.use_fast_inverse(P.dtype) and (
        LA.block_path_enabled(P, pad_ok=True) or LA.recursive_pair_enabled(P)
    ):
        L, WP = LA.chol_winv_padded(P)  # fused diag-block kernel path
        c = jnp.matmul(WP, KufY, precision=jax.lax.Precision.HIGHEST) / s2
    elif LA.use_fast_inverse(P.dtype):
        # f32 fast path: blocked P-factor inverse puts the c-solve (and its
        # autodiff backward) and the predict solves on the matmul path
        L = LA.cholesky(P)
        WP = LA.tri_inv_blocked(L)
        c = jnp.matmul(WP, KufY, precision=jax.lax.Precision.HIGHEST) / s2
    else:
        L, WP = LA.cholesky(P), None
        c = LA.tri_solve(L, KufY) / s2
    return dict(
        L=L, WP=WP, c=c, Kuu=Kuu, Kuu_inv=Kuu_inv, Kuu_logdet=Kuu_logdet, KufKfu=KufKfu,
        ym=ym, m=m, s2=s2, ls=ls, var_d=var_d, D=D,
    )


def elbo(cparams: dict, data: dict, *, kernel: str, a, b, M: int):
    t = vff_common(cparams, data, kernel=kernel, a=a, b=b, M=M)
    n = jnp.sum(t["m"])
    kv = cparams["kernel_variance"]  # product over dims of var_d
    log_det_P = 2.0 * jnp.sum(jnp.log(jnp.diagonal(t["L"])))
    out = -0.5 * n * jnp.log(2.0 * jnp.pi * t["s2"])
    out -= 0.5 * log_det_P
    out += 0.5 * t["Kuu_logdet"]
    out -= 0.5 * jnp.sum(t["ym"] ** 2) / t["s2"]
    out += 0.5 * jnp.sum(t["c"] ** 2)
    out -= 0.5 * n * kv / t["s2"]
    out += 0.5 * jnp.sum(t["Kuu_inv"] * t["KufKfu"]) / t["s2"]
    return out


def product_prior_gram(kernel: str, X1: jnp.ndarray, X2: jnp.ndarray, ls, kv):
    """Separable product-kernel prior gram: kv * prod_d k1d(x_d, x'_d; l_d).

    VFF's (and ASVGP's) prior is the PRODUCT of 1-d Materns per dimension
    (ref: vff_model.py:227-240), not the ARD Matern over the joint radius."""
    from gpsat_tpu.ops import kernels as KK

    D = X1.shape[1]
    one = jnp.asarray(1.0, dtype=X1.dtype)
    G = kv * jnp.ones((X1.shape[0], X2.shape[0]), dtype=X1.dtype)
    for d in range(D):
        G = G * KK.gram(kernel, X1[:, d : d + 1], X2[:, d : d + 1], ls[d : d + 1], one)
    return G


def predict(cparams: dict, data: dict, Xnew: jnp.ndarray, *, kernel: str, a, b, M: int, full_cov: bool = False):
    """Posterior at Xnew; full_cov=True adds ``f_cov`` (the reference's
    shared predict honors full_cov via gpflow predict_f,
    ref: GPSat/models/gpflow_models.py:230-260)."""
    from gpsat_tpu.ops import linalg as LA

    t = vff_common(cparams, data, kernel=kernel, a=a, b=b, M=M)
    D = t["D"]
    Kus_dims = [make_kuf(kernel, t["ls"][i], Xnew[:, i], a[i], b[i], M) for i in range(D)]
    Kus = make_kvs(Kus_dims)
    if t["WP"] is not None:
        tmp = jnp.matmul(t["WP"], Kus, precision=jax.lax.Precision.HIGHEST)
    else:
        tmp = LA.tri_solve(t["L"], Kus)
    from gpsat_tpu.models import means as MF

    f_mean = MF.add_mean(cparams, Xnew, (tmp.T @ t["c"])[:, 0])
    KiKus = t["Kuu_inv"] @ Kus
    kv = cparams["kernel_variance"]
    var = kv * jnp.ones(Xnew.shape[0], dtype=Kus.dtype)
    var += jnp.sum(tmp**2, axis=0)
    var -= jnp.sum(KiKus * Kus, axis=0)
    out = {"f_mean": f_mean, "f_var": var, "y_var": var + t["s2"]}
    if full_cov:
        Kss = product_prior_gram(kernel, Xnew, Xnew, t["ls"], kv)
        out["f_cov"] = Kss + tmp.T @ tmp - Kus.T @ KiKus
    return out


# --------------------------------------------------------------------------
# host-facing model
# --------------------------------------------------------------------------

class VFFModel(BaseGPRModel):
    """Host-facing VFF expert (reference GPflowVFFModel contract)."""

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
        num_inducing_features: Union[int, List[int], None] = None,
        kernel_kwargs: Optional[dict] = None,
        domain_size: Union[float, List[float], None] = None,
        expert_loc=None,
        noise_variance: Optional[float] = None,
        **kwargs,
    ):
        from gpsat_tpu.models import means as MF

        mean_function = MF.validate(kwargs.pop("mean_function", None))
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
        assert kernel in SUPPORTED_KERNELS, f"VFF kernel must be one of {SUPPORTED_KERNELS}"
        assert num_inducing_features is not None, "num_inducing_features must be specified"
        self.kernel = kernel
        D = self.coords.shape[1]
        if isinstance(num_inducing_features, list):
            assert len(set(num_inducing_features)) == 1, (
                "this build uses a shared per-dimension feature count"
            )
            num_inducing_features = num_inducing_features[0]
        self.M = int(num_inducing_features)

        # domain [a, b] per dim, centered on the expert, grown to contain
        # the data (ref: vff_model.py:178-211)
        if isinstance(domain_size, (int, float)):
            domain_size = [domain_size] * D
        cscale = np.broadcast_to(self.coords_scale, (1, D))
        a_list, b_list = [], []
        if domain_size is None:
            for i in range(D):
                a_list.append(self.coords[:, i].min() - 1e-8)
                b_list.append(self.coords[:, i].max() + 1e-8)
        else:
            assert len(domain_size) == D, "domain_size length must match coordinate dimensions"
            if expert_loc is None:
                expert_loc = np.mean(self.coords, axis=0) * cscale[0]
            expert_loc = np.asarray(expert_loc, dtype=float).reshape(-1)
            for i in range(D):
                a = (expert_loc[i] - domain_size[i]) / cscale[0, i]
                b = (expert_loc[i] + domain_size[i]) / cscale[0, i]
                lo, hi = self.coords[:, i].min(), self.coords[:, i].max()
                a_list.append(a if a < lo else lo - 1e-8)
                b_list.append(b if b > hi else hi + 1e-8)
        self.a = np.asarray(a_list)
        self.b = np.asarray(b_list)

        kk = dict(kernel_kwargs or {})
        ls = np.asarray(kk.get("lengthscales", np.ones(D)), dtype=float)
        if ls.ndim == 0:
            ls = np.full(D, float(ls))
        self._params = {
            "lengthscales": ls,
            "kernel_variance": np.asarray(float(kk.get("variance", 1.0))),
            "likelihood_variance": np.asarray(1.0 if noise_variance is None else float(noise_variance)),
        }
        self._bijectors = {name: T.POSITIVE for name in PARAM_NAMES}
        for p, dflt in MF.mean_param_defaults(mean_function, D).items():
            self._params[p] = dflt
            self._bijectors[p] = T.IDENTITY
        self._last_opt_result = None

    @property
    def param_names(self) -> List[str]:
        names = list(PARAM_NAMES)
        for p in ("mean_c", "mean_A"):
            if p in getattr(self, "_params", {}):
                names.append(p)
        return names

    def _data_dict(self):
        X = jnp.asarray(self.coords)
        return {"X": X, "y": jnp.asarray(self.obs[:, 0]), "mask": jnp.ones(X.shape[0], dtype=X.dtype)}

    def get_objective_function_value(self) -> float:
        """ELBO (matches reference VFF, vff_model.py get_objective_function_value)."""
        c = {k: jnp.asarray(v) for k, v in self._params.items()}
        return float(elbo(c, self._data_dict(), kernel=self.kernel, a=self.a, b=self.b, M=self.M))

    def optimise_parameters(self, max_iter: int = 10_000, fixed_params=None, **opt_kwargs) -> bool:
        from gpsat_tpu.optim.lbfgs import minimize_lbfgs

        fixed_params = list(fixed_params or [])
        data = self._data_dict()
        bij = self._bijectors
        kernel, a, b, M = self.kernel, self.a, self.b, self.M

        u_all = {k: bij[k].inverse(jnp.asarray(v)) for k, v in self._params.items()}
        u_free = {k: v for k, v in u_all.items() if k not in fixed_params}
        u_fixed = {k: v for k, v in u_all.items() if k in fixed_params}

        def objective(u_free_):
            u = {**u_free_, **u_fixed}
            c = {k: bij[k].forward(v) for k, v in u.items()}
            return -elbo(c, data, kernel=kernel, a=a, b=b, M=M)

        res = minimize_lbfgs(objective, u_free, max_iter=max_iter, **opt_kwargs)
        u_opt = {**res.params, **u_fixed}
        self._params = {k: np.asarray(bij[k].forward(jnp.asarray(v))) for k, v in u_opt.items()}
        self._last_opt_result = res
        return bool(np.asarray(res.converged))

    def predict(self, coords, full_cov: bool = False, apply_scale: bool = True) -> Dict[str, np.ndarray]:
        import pandas as pd

        if isinstance(coords, (pd.Series, pd.DataFrame)):
            coords = coords[self.coords_col].values if self.coords_col is not None else coords.values
        coords = np.asarray(coords, dtype=float)
        if coords.ndim == 1:
            coords = coords[None, :]
        if apply_scale:
            coords = coords / self.coords_scale
        if self.kernel == "Matern52":
            # Matern52 Kuf has no outside-domain edge corrections (the
            # reference hard-fails there too, ref: vff.py:499-517); fail
            # loudly rather than return the silently-wrong periodic
            # extension
            if np.any(coords < self.a) or np.any(coords > self.b):
                raise ValueError(
                    "VFF Matern52 prediction locations must lie inside the domain "
                    f"[a, b] = [{self.a}, {self.b}]; grow domain_size to cover them"
                )
        c = {k: jnp.asarray(v) for k, v in self._params.items()}
        pred = predict(c, self._data_dict(), jnp.asarray(coords), kernel=self.kernel, a=self.a, b=self.b, M=self.M, full_cov=full_cov)
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

    # --- getters/setters ---
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


# --------------------------------------------------------------------------
# batched functional core (TPU engine)
# --------------------------------------------------------------------------

def make_vff_core(
    kernel: str = "Matern32",
    bijectors: Optional[dict] = None,
    num_inducing_features: int = 10,
    domain_size=None,
    margin: float = 1e-3,
    mean_function=None,
):
    """VFF as a batched ModelCore: Fourier-feature experts run on the TPU
    engine (vmapped over padded tiles) instead of the host-serial lane.

    The per-expert cuboidal domain [a, b]^D (ref: vff_model.py:178-211)
    becomes a fixed [D, 2] model parameter laid over each tile's masked
    coordinate range by prepare_batch_init (grown to ``domain_size`` when
    given, centered on the tile's data).
    """
    from gpsat_tpu.models.functional import ModelCore

    from gpsat_tpu.models import means as MF

    assert kernel in SUPPORTED_KERNELS, f"VFF kernel must be one of {SUPPORTED_KERNELS}"
    MF.validate(mean_function)
    mean_names = MF.mean_param_names(mean_function)
    M = int(num_inducing_features)
    bij = {name: T.POSITIVE for name in PARAM_NAMES}
    bij["domain"] = T.IDENTITY
    if bijectors:
        bij.update({k: v for k, v in bijectors.items() if k != "domain"})
    for p in mean_names:
        bij.setdefault(p, T.IDENTITY)

    def forward(uparams):
        return {k: bij[k].forward(v) for k, v in uparams.items()}

    def inverse(cparams):
        return {k: bij[k].inverse(jnp.asarray(v)) for k, v in cparams.items()}

    def objective(uparams, data):
        c = forward(uparams)
        cp = {k: v for k, v in c.items() if k != "domain"}
        return -elbo(cp, data, kernel=kernel, a=c["domain"][:, 0], b=c["domain"][:, 1], M=M)

    def predict_fn(cparams, data, Xnew):
        dom = jnp.asarray(cparams["domain"])
        cp = {k: v for k, v in cparams.items() if k != "domain"}
        return predict(cp, data, Xnew, kernel=kernel, a=dom[:, 0], b=dom[:, 1], M=M)

    def init_cparams(D, dtype=np.float64, overrides=None):
        out = {
            "lengthscales": np.ones(D, dtype=dtype),
            "kernel_variance": np.asarray(1.0, dtype=dtype),
            "likelihood_variance": np.asarray(1.0, dtype=dtype),
            "domain": np.tile(np.asarray([0.0, 1.0], dtype=dtype), (D, 1)),
        }
        out.update(MF.mean_param_defaults(mean_function, D, dtype=dtype))
        for k, v in (overrides or {}).items():
            if k in out and k != "domain":
                out[k] = np.reshape(np.asarray(v, dtype=float), np.shape(out[k])) if np.shape(out[k]) else np.asarray(v, dtype=float)
        return out

    def prepare_batch_init(batch, init_cparams_):
        m = np.asarray(batch.mask)[..., None]
        X = np.asarray(batch.X)
        lo = np.where(m > 0, X, np.inf).min(axis=1) - margin  # [B, D]
        hi = np.where(m > 0, X, -np.inf).max(axis=1) + margin
        bad = ~np.isfinite(lo) | ~np.isfinite(hi)
        lo = np.where(bad, 0.0, lo)
        hi = np.where(bad, 1.0, hi)
        if kernel == "Matern52":
            # no outside-domain edge corrections for Matern52 (see make_kuf):
            # grow the domain to also cover the tile's live prediction
            # locations, else out-of-domain Xnew gets the silently-wrong
            # periodic extension
            pm = np.asarray(batch.pred_mask)[..., None]
            Xn = np.asarray(batch.Xnew)
            plo = np.where(pm > 0, Xn, np.inf).min(axis=1) - margin
            phi = np.where(pm > 0, Xn, -np.inf).max(axis=1) + margin
            lo = np.where(np.isfinite(plo), np.minimum(lo, plo), lo)
            hi = np.where(np.isfinite(phi), np.maximum(hi, phi), hi)
        if domain_size is not None:
            # center on the expert location (matching the host model and the
            # reference, vff_model.py:178-211: domain = expert +/- domain_size
            # per side, each side grown to contain the data) when the batch
            # carries it; data midpoint otherwise
            ds = np.asarray(domain_size, dtype=float).reshape(-1)
            mid = 0.5 * (lo + hi) if batch.expert_loc is None else np.asarray(batch.expert_loc)
            lo = mid - np.maximum(mid - lo, ds)
            hi = mid + np.maximum(hi - mid, ds)
        out = dict(init_cparams_)
        out["domain"] = np.stack([lo, hi], axis=-1)  # [B, D, 2]
        return out

    return ModelCore(
        name=f"vff_{kernel}",
        objective=objective,
        predict=predict_fn,
        forward=forward,
        inverse=inverse,
        init_cparams=init_cparams,
        param_names=("lengthscales", "kernel_variance", "likelihood_variance", "domain") + mean_names,
        default_fixed_params=("domain",),
        prepare_batch_init=prepare_batch_init,
        optimizer="lbfgs",
    )
