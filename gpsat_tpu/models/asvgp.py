"""ASVGP — Actually Sparse Variational GP with B-spline inducing features.

The reference exposes GPflowASVGPModel by importing an external (non-
vendored) clone (ref: GPSat/models/asvgp_model.py:9-11, optional
capability). This build implements the method directly for the
Matern12/B1 (hat) and Matern32/B2 (quadratic) kernel/spline pairs. The
Matern12 RKHS inner products are closed-form:

  Matern12 RKHS on [a, b]:
    <f, g> = (1/(2 s2)) [ (1/l) int f g + l int f' g' + f(a)g(a) + f(b)g(b) ]

  Hat basis {phi_i} on a uniform knot grid (spacing h):
    mass matrix     int phi_i phi_j : tridiagonal (2h/3, h/6)
    stiffness       int phi_i' phi_j': tridiagonal (2/h, -1/h)
  => Kuu = (1/(2 s2)) [ M/l + l S + boundary ], banded tridiagonal
     Kuf[i, n] = phi_i(x_n)  (inter-domain projection features)

Collapsed ELBO / posterior identical in form to VFF's GPR_kron
(gpsat_tpu.models.vff), with Kronecker structure across dimensions. The
bound converges to the exact GPR as the knot grid refines (tested for all
pairs). Matern32/B2 and Matern52/B3 assemble the banded RKHS Grams by
exact Gauss-Legendre quadrature (3- and 4-point) with boundary
corrections identified to machine precision from the reproducing property
(matern32_spline_kuu / matern52_spline_kuu) — full coverage of the
Matern family the reference's external ASVGP dependency supports.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gpsat_tpu.models.base import BaseGPRModel
from gpsat_tpu.models.vff import kron, make_kvs
from gpsat_tpu.ops import linalg as LA
from gpsat_tpu.ops import transforms as T

PARAM_NAMES = ["lengthscales", "kernel_variance", "likelihood_variance"]


def hat_basis_eval(x: jnp.ndarray, knots: jnp.ndarray) -> jnp.ndarray:
    """B1 (hat) basis evaluation: [M, N] with M = len(knots)."""
    h = knots[1] - knots[0]
    d = jnp.abs(x[None, :] - knots[:, None]) / h
    return jnp.maximum(0.0, 1.0 - d)


def matern12_spline_kuu(knots, lengthscale, variance) -> jnp.ndarray:
    """Tridiagonal RKHS Gram of the hat basis under the Matern12 kernel."""
    knots = jnp.asarray(knots)
    M = len(knots)
    h = knots[1] - knots[0]
    # mass matrix (interior rows 2h/3; boundary rows h/3)
    main_mass = jnp.full(M, 2 * h / 3).at[0].set(h / 3).at[-1].set(h / 3)
    off_mass = jnp.full(M - 1, h / 6)
    # stiffness matrix
    main_stiff = jnp.full(M, 2 / h).at[0].set(1 / h).at[-1].set(1 / h)
    off_stiff = jnp.full(M - 1, -1 / h)

    def tridiag(main, off):
        return jnp.diag(main) + jnp.diag(off, 1) + jnp.diag(off, -1)

    Mm = tridiag(main_mass, off_mass)
    Sm = tridiag(main_stiff, off_stiff)
    # boundary terms: phi_0(a)=1, phi_{M-1}(b)=1
    Bm = jnp.zeros((M, M), dtype=knots.dtype).at[0, 0].set(1.0).at[-1, -1].set(1.0)
    return (Mm / lengthscale + lengthscale * Sm + Bm) / (2.0 * variance)


def b2_basis(x: jnp.ndarray, knots: jnp.ndarray, deriv: int = 0) -> jnp.ndarray:
    """Quadratic (B2) spline basis on a uniform grid: [M, N], M = n_int + 2.

    phi_i(x) = B((x-a)/h - (i-2)) with B the C^1 quadratic B-spline on
    [0, 3]; deriv in {0, 1, 2} returns the basis / its derivatives (B2''
    is piecewise constant, fine for the Matern32 RKHS integrals since B2
    is C^1).
    """
    a = knots[0]
    h = knots[1] - knots[0]
    n_int = len(knots) - 1
    M = n_int + 2
    i = jnp.arange(M, dtype=x.dtype)
    t = (x[None, :] - a) / h - (i[:, None] - 2.0)  # [M, N] in knot units
    in0 = (t >= 0) & (t < 1)
    in1 = (t >= 1) & (t < 2)
    in2 = (t >= 2) & (t <= 3)
    if deriv == 0:
        v = jnp.where(in0, 0.5 * t**2, 0.0)
        v = jnp.where(in1, 0.5 * (-2 * t**2 + 6 * t - 3), v)
        v = jnp.where(in2, 0.5 * (3 - t) ** 2, v)
        return v
    if deriv == 1:
        v = jnp.where(in0, t, 0.0)
        v = jnp.where(in1, -2 * t + 3, v)
        v = jnp.where(in2, t - 3, v)
        return v / h
    if deriv == 2:
        v = jnp.where(in0, 1.0, 0.0)
        v = jnp.where(in1, -2.0, v)
        v = jnp.where(in2, 1.0, v)
        return v / h**2
    raise ValueError(f"deriv: {deriv}")


def matern32_spline_kuu(knots: np.ndarray, lengthscale, variance) -> jnp.ndarray:
    """Banded RKHS Gram of the B2 basis under the Matern32 kernel.

    Matern32 RKHS on [a, b] (lam = sqrt(3)/l; identified numerically to
    machine precision from the reproducing property <k(x,.), k(y,.)> =
    k(x, y), matching the VFF-paper construction the reference's external
    ASVGP dependency builds on):

      <f, g> = C [ int_a^b f''g'' + 2 lam^2 f'g' + lam^4 f g
                   + 2 lam^3 (f g)(a) + 2 lam (f'g')(a) - lam^2 (fg' + f'g)(a)
                   + 2 lam^3 (f g)(b) + 2 lam (f'g')(b) + lam^2 (fg' + f'g)(b) ]
      C = 1 / (4 lam^3 s2)

    Integrals of B2 products are degree <= 4 polynomials per interval:
    3-point Gauss-Legendre is exact.
    """
    knots = jnp.asarray(knots)
    lam = jnp.sqrt(3.0) / lengthscale
    a, b = knots[0], knots[-1]
    h = knots[1] - knots[0]
    n_int = len(knots) - 1
    # 3-point GL nodes/weights on [0, 1]
    gl_x = np.array([0.5 - np.sqrt(15) / 10, 0.5, 0.5 + np.sqrt(15) / 10])
    gl_w = np.array([5.0 / 18, 8.0 / 18, 5.0 / 18])
    xq = (knots[:-1][:, None] + jnp.asarray(gl_x, dtype=knots.dtype)[None, :] * h).reshape(-1)  # [3 n_int]
    wq = jnp.tile(jnp.asarray(gl_w, dtype=knots.dtype), n_int) * h

    F = b2_basis(xq, knots, 0)
    Fp = b2_basis(xq, knots, 1)
    Fpp = b2_basis(xq, knots, 2)
    integ = (
        (Fpp * wq) @ Fpp.T
        + 2.0 * lam**2 * (Fp * wq) @ Fp.T
        + lam**4 * (F * wq) @ F.T
    )
    ends = jnp.asarray([a, b]).reshape(2)
    V = b2_basis(ends, knots, 0)  # [M, 2]
    Dv = b2_basis(ends, knots, 1)
    va, vb = V[:, 0], V[:, 1]
    da, db = Dv[:, 0], Dv[:, 1]
    bnd = (
        2.0 * lam**3 * (jnp.outer(va, va) + jnp.outer(vb, vb))
        + 2.0 * lam * (jnp.outer(da, da) + jnp.outer(db, db))
        - lam**2 * (jnp.outer(va, da) + jnp.outer(da, va))
        + lam**2 * (jnp.outer(vb, db) + jnp.outer(db, vb))
    )
    return (integ + bnd) / (4.0 * lam**3 * variance)


def b3_basis(x: jnp.ndarray, knots: jnp.ndarray, deriv: int = 0) -> jnp.ndarray:
    """Cubic (B3) spline basis on a uniform grid: [M, N], M = n_int + 3.

    phi_i(x) = B((x-a)/h - (i-3)) with B the C^2 cubic B-spline on [0, 4].
    """
    a = knots[0]
    h = knots[1] - knots[0]
    n_int = len(knots) - 1
    M = n_int + 3
    i = jnp.arange(M, dtype=x.dtype)
    t = (x[None, :] - a) / h - (i[:, None] - 3.0)
    seg = [(t >= 0) & (t < 1), (t >= 1) & (t < 2), (t >= 2) & (t < 3), (t >= 3) & (t <= 4)]
    if deriv == 0:
        polys = [t**3 / 6, (-3 * t**3 + 12 * t**2 - 12 * t + 4) / 6,
                 (3 * t**3 - 24 * t**2 + 60 * t - 44) / 6, (4 - t) ** 3 / 6]
        scale = 1.0
    elif deriv == 1:
        polys = [t**2 / 2, (-9 * t**2 + 24 * t - 12) / 6,
                 (9 * t**2 - 48 * t + 60) / 6, -((4 - t) ** 2) / 2]
        scale = 1.0 / h
    elif deriv == 2:
        polys = [t, -3 * t + 4, 3 * t - 8, 4 - t]
        scale = 1.0 / h**2
    elif deriv == 3:
        one = jnp.ones_like(t)
        polys = [one, -3 * one, 3 * one, -one]
        scale = 1.0 / h**3
    else:
        raise ValueError(f"deriv: {deriv}")
    v = jnp.zeros_like(t)
    for s, p in zip(seg, polys):
        v = jnp.where(s, p, v)
    return v * scale


def matern52_spline_kuu(knots: np.ndarray, lengthscale, variance) -> jnp.ndarray:
    """Banded RKHS Gram of the B3 basis under the Matern52 kernel.

    Matern52 RKHS on [a, b] (lam = sqrt(5)/l; boundary form identified to
    machine precision — residual 4e-24 — from the reproducing property):

      <f, g> = C [ int_a^b f'''g''' + 3 lam^2 f''g'' + 3 lam^4 f'g' + lam^6 fg
                   + at each end p in {a, b} (sign s = -1 at a, +1 at b):
                     3 lam^5 fg + 8 lam^3 f'g' + 3 lam f''g''
                     + 3 s lam^4 (fg' + f'g) + lam^3 (fg'' + f''g)
                     + 3 s lam^2 (f'g'' + f''g') ]
      C = 3 / (16 lam^5 s2)

    B3 products are degree <= 6 polynomials per interval: 4-point
    Gauss-Legendre is exact.
    """
    knots = jnp.asarray(knots)
    lam = jnp.sqrt(5.0) / lengthscale
    a, b = knots[0], knots[-1]
    h = knots[1] - knots[0]
    n_int = len(knots) - 1
    # 4-point GL on [0, 1]
    r1 = np.sqrt(3.0 / 7.0 - 2.0 / 7.0 * np.sqrt(6.0 / 5.0))
    r2 = np.sqrt(3.0 / 7.0 + 2.0 / 7.0 * np.sqrt(6.0 / 5.0))
    gl_x = 0.5 + 0.5 * np.array([-r2, -r1, r1, r2])
    w1 = (18.0 + np.sqrt(30.0)) / 72.0
    w2 = (18.0 - np.sqrt(30.0)) / 72.0
    gl_w = np.array([w2, w1, w1, w2])
    xq = (knots[:-1][:, None] + jnp.asarray(gl_x, dtype=knots.dtype)[None, :] * h).reshape(-1)
    wq = jnp.tile(jnp.asarray(gl_w, dtype=knots.dtype), n_int) * h

    F = b3_basis(xq, knots, 0)
    Fp = b3_basis(xq, knots, 1)
    Fpp = b3_basis(xq, knots, 2)
    Fppp = b3_basis(xq, knots, 3)
    integ = (
        (Fppp * wq) @ Fppp.T
        + 3.0 * lam**2 * (Fpp * wq) @ Fpp.T
        + 3.0 * lam**4 * (Fp * wq) @ Fp.T
        + lam**6 * (F * wq) @ F.T
    )
    ends = jnp.asarray([a, b]).reshape(2)
    V, Dv, D2v = (b3_basis(ends, knots, d) for d in (0, 1, 2))
    bnd = jnp.zeros_like(integ)
    for col, sign in ((0, -1.0), (1, 1.0)):
        v, dv, d2 = V[:, col], Dv[:, col], D2v[:, col]
        bnd = bnd + (
            3.0 * lam**5 * jnp.outer(v, v)
            + 8.0 * lam**3 * jnp.outer(dv, dv)
            + 3.0 * lam * jnp.outer(d2, d2)
            + 3.0 * sign * lam**4 * (jnp.outer(v, dv) + jnp.outer(dv, v))
            + lam**3 * (jnp.outer(v, d2) + jnp.outer(d2, v))
            + 3.0 * sign * lam**2 * (jnp.outer(dv, d2) + jnp.outer(d2, dv))
        )
    return 3.0 * (integ + bnd) / (16.0 * lam**5 * variance)


_SPLINE_PAIRS = {
    # kernel -> (basis eval fn(x, knots) -> [M, N], kuu fn(knots, l, s2))
    "Matern12": (hat_basis_eval, matern12_spline_kuu),
    "Matern32": (lambda x, kn: b2_basis(x, kn, 0), matern32_spline_kuu),
    "Matern52": (lambda x, kn: b3_basis(x, kn, 0), matern52_spline_kuu),
}


def _per_dim(cparams: dict, D: int):
    ls = cparams["lengthscales"].reshape(D)
    var_d = cparams["kernel_variance"] ** (1.0 / D)
    return ls, var_d


def _factors(cparams: dict, data: dict, knots_list, *, D: int, kernel: str = "Matern12"):
    from gpsat_tpu.models import means as MF

    X, y, m = data["X"], data["y"], data["mask"].astype(data["X"].dtype)
    # trainable prior mean (Constant/Linear): bound on centered obs
    y = y - MF.mean_value(cparams, X) if MF.has_mean(cparams) else y
    ls, var_d = _per_dim(cparams, D)
    s2 = cparams["likelihood_variance"]
    basis_eval, kuu_fn = _SPLINE_PAIRS[kernel]
    Kuf_dims = [basis_eval(X[:, i], jnp.asarray(knots_list[i], dtype=X.dtype)) for i in range(D)]
    Kuf = make_kvs(Kuf_dims) * m[None, :]
    Kuu_dims = [kuu_fn(jnp.asarray(knots_list[i], dtype=X.dtype), ls[i], var_d) for i in range(D)]
    Kuu = kron(Kuu_dims)
    Kuu_inv = kron([jnp.linalg.inv(Kd) for Kd in Kuu_dims])
    Mtot = Kuu.shape[0]
    Ms = [Kd.shape[0] for Kd in Kuu_dims]
    logdets = [jnp.linalg.slogdet(Kd)[1] for Kd in Kuu_dims]
    Kuu_logdet = sum((Mtot / Ms[i]) * logdets[i] for i in range(D))

    ym = y * m
    KufY = Kuf @ ym[:, None]
    KufKfu = Kuf @ Kuf.T
    P = KufKfu / s2 + Kuu
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
        L, WP = jnp.linalg.cholesky(P), None
        c = LA.tri_solve(L, KufY) / s2
    return dict(L=L, WP=WP, c=c, Kuu_inv=Kuu_inv, Kuu_logdet=Kuu_logdet, KufKfu=KufKfu, ym=ym, m=m, s2=s2)


def elbo(cparams: dict, data: dict, knots_list, kernel: str = "Matern12"):
    D = data["X"].shape[1]
    t = _factors(cparams, data, knots_list, D=D, kernel=kernel)
    n = jnp.sum(t["m"])
    kv = cparams["kernel_variance"]
    log_det_P = 2.0 * jnp.sum(jnp.log(jnp.diagonal(t["L"])))
    out = -0.5 * n * jnp.log(2.0 * jnp.pi * t["s2"])
    out -= 0.5 * log_det_P
    out += 0.5 * t["Kuu_logdet"]
    out -= 0.5 * jnp.sum(t["ym"] ** 2) / t["s2"]
    out += 0.5 * jnp.sum(t["c"] ** 2)
    out -= 0.5 * n * kv / t["s2"]
    out += 0.5 * jnp.sum(t["Kuu_inv"] * t["KufKfu"]) / t["s2"]
    return out


def predict(cparams: dict, data: dict, Xnew: jnp.ndarray, knots_list, kernel: str = "Matern12", full_cov: bool = False):
    """Posterior at Xnew; full_cov=True adds ``f_cov`` (separable product
    prior, like VFF — ref: GPSat/models/gpflow_models.py:230-260)."""
    D = data["X"].shape[1]
    t = _factors(cparams, data, knots_list, D=D, kernel=kernel)
    basis_eval, _ = _SPLINE_PAIRS[kernel]
    Kus_dims = [basis_eval(Xnew[:, i], jnp.asarray(knots_list[i], dtype=Xnew.dtype)) for i in range(D)]
    Kus = make_kvs(Kus_dims)
    if t["WP"] is not None:
        tmp = jnp.matmul(t["WP"], Kus, precision=jax.lax.Precision.HIGHEST)
    else:
        tmp = LA.tri_solve(t["L"], Kus)
    from gpsat_tpu.models import means as MF

    f_mean = MF.add_mean(cparams, Xnew, (tmp.T @ t["c"])[:, 0])
    KiKus = t["Kuu_inv"] @ Kus
    kv = cparams["kernel_variance"]
    var = kv * jnp.ones(Xnew.shape[0], dtype=Kus.dtype) + jnp.sum(tmp**2, axis=0) - jnp.sum(KiKus * Kus, axis=0)
    out = {"f_mean": f_mean, "f_var": var, "y_var": var + t["s2"]}
    if full_cov:
        from gpsat_tpu.models.vff import product_prior_gram

        ls, _ = _per_dim(cparams, D)
        Kss = product_prior_gram(kernel, Xnew, Xnew, ls, kv)
        out["f_cov"] = Kss + tmp.T @ tmp - Kus.T @ KiKus
    return out


class ASVGPModel(BaseGPRModel):
    """Host-facing ASVGP expert (Matern12/B1 and Matern32/B2 spline pairs)."""

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
        kernel: str = "Matern12",
        num_inducing_features: Union[int, None] = None,
        domain_size: Union[float, List[float], None] = None,
        expert_loc=None,
        noise_variance: Optional[float] = None,
        margin: Union[float, List[float]] = 0.1,
        **kwargs,
    ):
        from gpsat_tpu.models import means as MF

        mean_function = MF.validate(kwargs.pop("mean_function", None))
        super().__init__(
            data=data, coords_col=coords_col, obs_col=obs_col, coords=coords, obs=obs,
            coords_scale=coords_scale, obs_scale=obs_scale, obs_mean=obs_mean, verbose=verbose,
        )
        assert kernel in _SPLINE_PAIRS, (
            f"ASVGP implements the Matern12/B1, Matern32/B2 and Matern52/B3 "
            f"spline pairs; got kernel={kernel!r} — use VFF or SGPR for other kernels"
        )
        assert num_inducing_features is not None, "num_inducing_features must be specified"
        self.kernel = kernel
        D = self.coords.shape[1]
        M = int(num_inducing_features)
        if isinstance(margin, (int, float)):
            margin = [float(margin)] * D
        self.knots_list = []
        for i in range(D):
            lo = self.coords[:, i].min() - margin[i]
            hi = self.coords[:, i].max() + margin[i]
            self.knots_list.append(np.linspace(lo, hi, M))

        self._params = {
            "lengthscales": np.ones(D),
            "kernel_variance": np.asarray(1.0),
            "likelihood_variance": np.asarray(1.0 if noise_variance is None else float(noise_variance)),
        }
        self._bijectors = {name: T.POSITIVE for name in PARAM_NAMES}
        for p, dflt in MF.mean_param_defaults(mean_function, D).items():
            self._params[p] = dflt
            self._bijectors[p] = T.IDENTITY

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
        c = {k: jnp.asarray(v) for k, v in self._params.items()}
        return float(elbo(c, self._data_dict(), self.knots_list, self.kernel))

    def optimise_parameters(self, max_iter: int = 10_000, fixed_params=None, **opt_kwargs) -> bool:
        from gpsat_tpu.optim.lbfgs import minimize_lbfgs

        fixed_params = list(fixed_params or [])
        data = self._data_dict()
        bij = self._bijectors
        knots = self.knots_list
        u_all = {k: bij[k].inverse(jnp.asarray(v)) for k, v in self._params.items()}
        u_free = {k: v for k, v in u_all.items() if k not in fixed_params}
        u_fixed = {k: v for k, v in u_all.items() if k in fixed_params}

        def objective(uf):
            c = {k: bij[k].forward(v) for k, v in {**uf, **u_fixed}.items()}
            return -elbo(c, data, knots, self.kernel)

        res = minimize_lbfgs(objective, u_free, max_iter=max_iter, **opt_kwargs)
        u_opt = {**res.params, **u_fixed}
        self._params = {k: np.asarray(bij[k].forward(jnp.asarray(v))) for k, v in u_opt.items()}
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
        c = {k: jnp.asarray(v) for k, v in self._params.items()}
        pred = predict(c, self._data_dict(), jnp.asarray(coords), self.knots_list, self.kernel, full_cov=full_cov)
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

    # getters/setters
    def get_lengthscales(self):
        return np.asarray(self._params["lengthscales"])

    def get_kernel_variance(self):
        return float(self._params["kernel_variance"])

    def get_likelihood_variance(self):
        return float(self._params["likelihood_variance"])

    def set_lengthscales(self, v):
        ls = np.atleast_1d(np.asarray(v, dtype=float))
        self._params["lengthscales"] = np.full(self.coords.shape[1], ls[0]) if len(ls) == 1 else ls

    def set_kernel_variance(self, v):
        self._params["kernel_variance"] = np.asarray(np.ravel(v)[0], dtype=float)

    def set_likelihood_variance(self, v):
        self._params["likelihood_variance"] = np.asarray(np.ravel(v)[0], dtype=float)

    # constraints: sigmoid reparam via BaseGPRModel._set_constraint
    # (ref: asvgp_model.py set_*_constraints via the gpflow bijector path)


# --------------------------------------------------------------------------
# batched functional core (TPU engine)
# --------------------------------------------------------------------------

def make_asvgp_core(
    kernel: str = "Matern12",
    bijectors: Optional[dict] = None,
    num_inducing_features: int = 20,
    margin: Union[float, List[float]] = 0.1,
    mean_function=None,
):
    """ASVGP as a batched ModelCore: spline experts run on the TPU engine
    (vmapped over padded tiles) instead of the host-serial lane.

    Per-expert knot grids are a fixed parameter (the SGPR inducing-point
    pattern): prepare_batch_init lays a uniform [D, M] grid over each
    tile's masked coordinate range +- margin, exactly what the host
    ASVGPModel does per expert.
    """
    from gpsat_tpu.models import means as MF
    from gpsat_tpu.models.functional import ModelCore

    assert kernel in _SPLINE_PAIRS, f"kernel {kernel!r} not in {sorted(_SPLINE_PAIRS)}"
    MF.validate(mean_function)
    mean_names = MF.mean_param_names(mean_function)
    M = int(num_inducing_features)
    bij = {name: T.POSITIVE for name in PARAM_NAMES}
    bij["knots"] = T.IDENTITY
    if bijectors:
        bij.update({k: v for k, v in bijectors.items() if k != "knots"})
    for p in mean_names:
        bij.setdefault(p, T.IDENTITY)

    def forward(uparams):
        return {k: bij[k].forward(v) for k, v in uparams.items()}

    def inverse(cparams):
        return {k: bij[k].inverse(jnp.asarray(v)) for k, v in cparams.items()}

    def objective(uparams, data):
        c = forward(uparams)
        D = data["X"].shape[1]
        knots_list = [c["knots"][d] for d in range(D)]
        cp = {k: v for k, v in c.items() if k != "knots"}
        return -elbo(cp, data, knots_list, kernel)

    def predict_fn(cparams, data, Xnew):
        D = data["X"].shape[1]
        knots_list = [jnp.asarray(cparams["knots"])[d] for d in range(D)]
        cp = {k: v for k, v in cparams.items() if k != "knots"}
        return predict(cp, data, Xnew, knots_list, kernel)

    def init_cparams(D, dtype=np.float64, overrides=None):
        out = {
            "lengthscales": np.ones(D, dtype=dtype),
            "kernel_variance": np.asarray(1.0, dtype=dtype),
            "likelihood_variance": np.asarray(1.0, dtype=dtype),
            "knots": np.zeros((D, M), dtype=dtype),
        }
        out.update(MF.mean_param_defaults(mean_function, D, dtype=dtype))
        for k, v in (overrides or {}).items():
            if k in out and k != "knots":
                out[k] = np.reshape(np.asarray(v, dtype=float), np.shape(out[k])) if np.shape(out[k]) else np.asarray(v, dtype=float)
        return out

    def prepare_batch_init(batch, init_cparams_):
        m = np.asarray(batch.mask)[..., None]
        X = np.asarray(batch.X)
        mg = np.asarray(margin, dtype=float).reshape(-1)
        lo = np.where(m > 0, X, np.inf).min(axis=1) - mg  # [B, D]
        hi = np.where(m > 0, X, -np.inf).max(axis=1) + mg
        # dead tiles (all-masked): harmless unit domain
        bad = ~np.isfinite(lo) | ~np.isfinite(hi)
        lo = np.where(bad, 0.0, lo)
        hi = np.where(bad, 1.0, hi)
        t = np.linspace(0.0, 1.0, M)
        knots = lo[..., None] + (hi - lo)[..., None] * t[None, None, :]  # [B, D, M]
        out = dict(init_cparams_)
        out["knots"] = knots
        return out

    return ModelCore(
        name=f"asvgp_{kernel}",
        objective=objective,
        predict=predict_fn,
        forward=forward,
        inverse=inverse,
        init_cparams=init_cparams,
        param_names=("lengthscales", "kernel_variance", "likelihood_variance", "knots") + mean_names,
        default_fixed_params=("knots",),
        prepare_batch_init=prepare_batch_init,
        optimizer="lbfgs",
    )
