"""Multi-output GP with a linear observation operator (experimental).

TPU-native analogue of the reference's GPSat/models/multioutput/ package
(gpr.py:14-82, likelihoods.py, utils.py:9-65 — experimental there, with
broken relative imports). Observations are linear combinations of L
latent GPs: y_n = H f(x_n) + eps, eps ~ N(0, R), H: [P, L].

Latent prior: independent GPs per latent dimension (the
SeparateIndependent case), K[(n,l),(n',l')] = delta_ll' k_l(x, x').
The LML and posterior work on the (N*P, N*P) flattened covariance exactly
as the reference (gpr.py:41-79).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from gpsat_tpu.ops import kernels as K
from gpsat_tpu.ops import linalg as LA


def latent_gram(X1, X2, lengthscales, variances, kernel: str):
    """[L] independent latent Grams -> [L, N, M].

    lengthscales: [L, D]; variances: [L]."""
    Ls = []
    for l in range(lengthscales.shape[0]):
        Ls.append(K.gram(kernel, X1, X2, lengthscales[l], variances[l]))
    return jnp.stack(Ls, axis=0)


def observed_cov(Kl: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """[L, N, M] latent Grams + H [P, L] -> [N*P, M*P] observed covariance.

    Cov(y_n^p, y_m^q) = sum_l H[p,l] H[q,l] k_l(x_n, x_m).
    """
    # [P, P, N, M]
    HKH = jnp.einsum("pl,ql,lnm->pqnm", H, H, Kl)
    # -> [N, P, M, Q] -> [(N P), (M Q)]
    NP = HKH.shape[2] * HKH.shape[0]
    MQ = HKH.shape[3] * HKH.shape[1]
    return jnp.transpose(HKH, (2, 0, 3, 1)).reshape(NP, MQ)


def mo_gpr_lml(cparams: dict, X: jnp.ndarray, Y: jnp.ndarray, H: jnp.ndarray, *, kernel: str = "Matern32"):
    """log N(vec(Y) | 0, H K H^T + R kron I) (ref: gpr.py:41-57)."""
    N, P = Y.shape
    Kl = latent_gram(X, X, cparams["lengthscales"], cparams["kernel_variances"], kernel)
    S = observed_cov(Kl, H)
    R = jnp.asarray(cparams["likelihood_variance"])
    noise = jnp.tile(R if R.ndim else jnp.full((P,), R), N) if (R.ndim <= 1) else None
    assert noise is not None, "likelihood_variance must be scalar or [P]"
    S = S + jnp.diag(noise)
    L = jnp.linalg.cholesky(S)
    yv = Y.reshape(-1, 1)
    alpha = LA.cho_solve(L, yv)
    return (
        -0.5 * jnp.sum(yv * alpha)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * N * P * jnp.log(2 * jnp.pi)
    )


def mo_gpr_predict(
    cparams: dict, X: jnp.ndarray, Y: jnp.ndarray, H: jnp.ndarray, Xnew: jnp.ndarray, *, kernel: str = "Matern32"
):
    """Posterior over the LATENT processes f at Xnew: mean [N*, L] and
    marginal variance [N*, L] (ref: gpr.py:59-79, utils.py multioutput_conditional)."""
    N, P = Y.shape
    Nn = Xnew.shape[0]
    Lat = cparams["lengthscales"].shape[0]

    Kl_mm = latent_gram(X, X, cparams["lengthscales"], cparams["kernel_variances"], kernel)
    S = observed_cov(Kl_mm, H)
    R = jnp.asarray(cparams["likelihood_variance"])
    noise = jnp.tile(R if R.ndim else jnp.full((P,), R), N)
    S = S + jnp.diag(noise)
    Lc = jnp.linalg.cholesky(S)

    Kl_mn = latent_gram(X, Xnew, cparams["lengthscales"], cparams["kernel_variances"], kernel)
    # cross-cov between observed y (N, P) and latent f_l(x*) (Nn, L):
    # Cov(y_n^p, f_l(x*)) = H[p, l] k_l(x_n, x*)
    C = jnp.einsum("pl,lnm->npml", H, Kl_mn).reshape(N * P, Nn * Lat)

    A = LA.tri_solve(Lc, C)
    alpha = LA.cho_solve(Lc, Y.reshape(-1, 1))
    mean = (C.T @ alpha).reshape(Nn, Lat)

    prior_var = jnp.stack(
        [jnp.full((Nn,), cparams["kernel_variances"][l]) for l in range(Lat)], axis=1
    )
    reduction = jnp.sum(A * A, axis=0).reshape(Nn, Lat)
    var = prior_var - reduction
    return mean, var


class MultioutputGPRModel:
    """Host-facing multi-output exact GPR (experimental, mirrors the
    reference's out-of-registry status)."""

    def __init__(
        self,
        coords: np.ndarray,
        obs: np.ndarray,
        H: np.ndarray,
        kernel: str = "Matern32",
        lengthscales: Optional[np.ndarray] = None,
        kernel_variances: Optional[np.ndarray] = None,
        likelihood_variance: float = 1.0,
    ):
        self.coords = np.atleast_2d(np.asarray(coords, dtype=float))
        self.obs = np.atleast_2d(np.asarray(obs, dtype=float))
        self.H = np.asarray(H, dtype=float)
        P, L = self.H.shape
        assert self.obs.shape[1] == P, f"obs has {self.obs.shape[1]} outputs but H is [{P}, {L}]"
        D = self.coords.shape[1]
        self.kernel = kernel
        self._params = {
            "lengthscales": np.ones((L, D)) if lengthscales is None else np.asarray(lengthscales, dtype=float),
            "kernel_variances": np.ones(L) if kernel_variances is None else np.asarray(kernel_variances, dtype=float),
            "likelihood_variance": np.asarray(float(likelihood_variance)),
        }

    def _c(self):
        return {k: jnp.asarray(v) for k, v in self._params.items()}

    def get_objective_function_value(self) -> float:
        return -float(
            mo_gpr_lml(self._c(), jnp.asarray(self.coords), jnp.asarray(self.obs), jnp.asarray(self.H), kernel=self.kernel)
        )

    def optimise_parameters(self, max_iter: int = 500) -> bool:
        from gpsat_tpu.optim.lbfgs import minimize_lbfgs
        from gpsat_tpu.ops import transforms as T

        X = jnp.asarray(self.coords)
        Y = jnp.asarray(self.obs)
        H = jnp.asarray(self.H)
        kernel = self.kernel

        u0 = {
            "lengthscales": T.POSITIVE.inverse(jnp.asarray(self._params["lengthscales"])),
            "kernel_variances": T.POSITIVE.inverse(jnp.asarray(self._params["kernel_variances"])),
            "likelihood_variance": T.POSITIVE.inverse(jnp.asarray(self._params["likelihood_variance"])),
        }

        def objective(u):
            c = {k: T.POSITIVE.forward(v) for k, v in u.items()}
            return -mo_gpr_lml(c, X, Y, H, kernel=kernel)

        res = minimize_lbfgs(objective, u0, max_iter=max_iter)
        self._params = {k: np.asarray(T.POSITIVE.forward(v)) for k, v in res.params.items()}
        return bool(np.asarray(res.converged))

    def predict(self, coords: np.ndarray) -> Dict[str, np.ndarray]:
        mean, var = mo_gpr_predict(
            self._c(),
            jnp.asarray(self.coords),
            jnp.asarray(self.obs),
            jnp.asarray(self.H),
            jnp.asarray(np.atleast_2d(coords)),
            kernel=self.kernel,
        )
        return {"f*": np.asarray(mean), "f*_var": np.asarray(var)}
