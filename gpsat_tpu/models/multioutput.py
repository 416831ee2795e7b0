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

import jax
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


def mo_svgp_elbo(cparams: dict, X, Y, H, *, kernel: str = "Matern32", jitter: float = 1e-6):
    """Multi-output SVGP ELBO with a linear observation operator
    (ref: multioutput/gpr.py:82-135 MultioutputSVGP + ForwardModelLikelihood).

    L whitened latent SVGPs share inducing locations Z; observations are
    y_n = H f(x_n) + eps with eps ~ N(0, R I_P).
    E_q[log N(y | H f, R)] needs only the latent marginals since the
    latents are a-posteriori independent across l given q:
      -P/2 log(2 pi R) - (|y - H mu|^2 + sum_p sum_l H_pl^2 var_l) / (2 R)
    """
    from gpsat_tpu.models.svgp import _whitened_marginals, kl_whitened

    Lat = cparams["q_mu"].shape[0]
    mus, vars_ = [], []
    kl = 0.0
    for l in range(Lat):
        c_l = {
            "inducing_points": cparams["inducing_points"],
            "lengthscales": cparams["lengthscales"][l],
            "kernel_variance": cparams["kernel_variances"][l],
            "inducing_mean": cparams["q_mu"][l],
            "inducing_chol": cparams["q_sqrt"][l],
        }
        mu_l, var_l = _whitened_marginals(c_l, X, kernel=kernel, jitter=jitter)
        mus.append(mu_l)
        vars_.append(var_l)
        kl = kl + kl_whitened(cparams["q_mu"][l], cparams["q_sqrt"][l])
    F_mu = jnp.stack(mus, axis=1)  # [N, L]
    F_var = jnp.stack(vars_, axis=1)
    R = cparams["likelihood_variance"]
    resid = Y - F_mu @ H.T  # [N, P]
    var_term = F_var @ (H**2).T  # [N, P]
    N, P = Y.shape
    ve = -0.5 * jnp.log(2 * jnp.pi * R) - 0.5 * (resid**2 + var_term) / R
    return jnp.sum(ve) - kl


class MultioutputSVGPModel:
    """Multi-output SVGP with linear observation operator (experimental,
    mirrors the reference's MultioutputSVGP)."""

    def __init__(
        self,
        coords: np.ndarray,
        obs: np.ndarray,
        H: np.ndarray,
        num_inducing_points: int = 64,
        kernel: str = "Matern32",
        likelihood_variance: float = 0.1,
        seed: int = 0,
    ):
        self.coords = np.atleast_2d(np.asarray(coords, dtype=float))
        self.obs = np.atleast_2d(np.asarray(obs, dtype=float))
        self.H = np.asarray(H, dtype=float)
        P, L = self.H.shape
        D = self.coords.shape[1]
        self.kernel = kernel
        rng = np.random.default_rng(seed)
        M = min(num_inducing_points, len(self.coords))
        Z = self.coords[rng.choice(len(self.coords), M, replace=False)]
        self._params = {
            "inducing_points": Z,
            "lengthscales": np.ones((L, D)),
            "kernel_variances": np.ones(L),
            "likelihood_variance": np.asarray(float(likelihood_variance)),
            "q_mu": np.zeros((L, M)),
            "q_sqrt": np.stack([np.eye(M)] * L),
        }

    def get_objective_function_value(self) -> float:
        c = {k: jnp.asarray(v) for k, v in self._params.items()}
        return float(mo_svgp_elbo(c, jnp.asarray(self.coords), jnp.asarray(self.obs), jnp.asarray(self.H), kernel=self.kernel))

    def optimise_parameters(self, max_iter: int = 1000, learning_rate: float = 0.02) -> bool:
        import optax

        from gpsat_tpu.ops import transforms as T

        X = jnp.asarray(self.coords)
        Y = jnp.asarray(self.obs)
        H = jnp.asarray(self.H)
        kernel = self.kernel
        pos = ("lengthscales", "kernel_variances", "likelihood_variance")

        u = {
            k: (T.POSITIVE.inverse(jnp.asarray(v)) if k in pos else jnp.asarray(v))
            for k, v in self._params.items()
        }

        def loss(u):
            c = {k: (T.POSITIVE.forward(v) if k in pos else v) for k, v in u.items()}
            return -mo_svgp_elbo(c, X, Y, H, kernel=kernel)

        opt = optax.adam(learning_rate)
        state = opt.init(u)

        @jax.jit
        def step(u, state):
            val, g = jax.value_and_grad(loss)(u)
            upd, state = opt.update(g, state)
            return optax.apply_updates(u, upd), state, val

        val = None
        for _ in range(max_iter):
            u, state, val = step(u, state)
        self._params = {
            k: np.asarray(T.POSITIVE.forward(v) if k in pos else v) for k, v in u.items()
        }
        return bool(np.isfinite(float(val)))

    def predict(self, coords: np.ndarray) -> Dict[str, np.ndarray]:
        """Latent posterior marginals at coords: mean/var [N*, L]."""
        from gpsat_tpu.models.svgp import _whitened_marginals

        Xs = jnp.asarray(np.atleast_2d(coords))
        L = self._params["q_mu"].shape[0]
        mus, vs = [], []
        for l in range(L):
            c_l = {
                "inducing_points": jnp.asarray(self._params["inducing_points"]),
                "lengthscales": jnp.asarray(self._params["lengthscales"][l]),
                "kernel_variance": jnp.asarray(self._params["kernel_variances"][l]),
                "inducing_mean": jnp.asarray(self._params["q_mu"][l]),
                "inducing_chol": jnp.asarray(self._params["q_sqrt"][l]),
            }
            mu, v = _whitened_marginals(c_l, Xs, kernel=self.kernel, jitter=1e-6)
            mus.append(np.asarray(mu))
            vs.append(np.asarray(v))
        return {"f*": np.stack(mus, axis=1), "f*_var": np.stack(vs, axis=1)}


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
