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


# --------------------------------------------------------------------------
# Forward models + model-based likelihoods
# (ref: multioutput/utils.py:9-65, multioutput/likelihoods.py:14-216 —
# re-designed on jax.numpy; same math, no gpflow/check_shapes machinery)
# --------------------------------------------------------------------------


def multivariate_gaussian_log_density(x, mu, cov):
    """log N(x | mu, cov), batched over leading dims
    (ref: multioutput/utils.py multivariate_gaussian_log_density)."""
    x, mu, cov = jnp.asarray(x), jnp.asarray(mu), jnp.asarray(cov)
    P = mu.shape[-1]
    diff = (mu - x)[..., :, None]
    cov_b = jnp.broadcast_to(cov, mu.shape + (P,))
    sol = jnp.linalg.solve(cov_b, diff)
    _, logdet = jnp.linalg.slogdet(cov)
    quad = jnp.squeeze(
        jnp.matmul(jnp.swapaxes(diff, -1, -2), sol, precision=jax.lax.Precision.HIGHEST),
        (-1, -2))
    return -(P / 2) * jnp.log(2 * jnp.pi) - 0.5 * logdet - 0.5 * quad


def add_likelihood_noise_cov(K, R):
    """K: [..., N, N, P, P]; adds block-diagonal R at n==n'
    (ref: multioutput/utils.py add_likelihood_noise_cov — the reference
    round-trips through an (NP, NP) LinearOperatorBlockDiag; a broadcast
    over the n==n' diagonal is equivalent)."""
    K = jnp.asarray(K)
    N = K.shape[-3]
    eye = jnp.eye(N)[:, :, None, None]
    return K + eye * jnp.asarray(R)


def multioutput_conditional(Kmn, Kmm, Knn, f, H, R, *, full_cov: bool = False):
    """Posterior over L latent processes at N points given M observed
    P-vectors f (ref: multioutput/utils.py multioutput_conditional).

    Kmn: [M, L, N, L]; Kmm: [M, L, M, L]; Knn: [N, L, N, L] (full_cov) or
    [N, L, L]; f: [M, P]; H: [P, L]; R: [P, P].
    Returns (mean [N, L], var [N, L, N, L] | [N, L, L]).

    Implementation collapses the 4-d tensors to dense matrices and applies
    the block observation operator kron(I_M, H) — identical math to the
    reference's transpose/reshape pipeline, one Cholesky of (MP, MP).
    """
    Kmn, Kmm, Knn = jnp.asarray(Kmn), jnp.asarray(Kmm), jnp.asarray(Knn)
    f, H, R = jnp.asarray(f), jnp.asarray(H), jnp.asarray(R)
    M, L, N, _ = Kmn.shape
    P = H.shape[0]
    hi = jax.lax.Precision.HIGHEST  # bf16 matmul default breaks the
    # Cholesky conditioning of ks on TPU (see CLAUDE.md / ops.kernels)
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    Kmm_d = Kmm.reshape(M * L, M * L)
    Kmn_d = Kmn.reshape(M * L, N * L)
    Hb = jnp.kron(jnp.eye(M), H)                      # [M P, M L]
    ks = mm(mm(Hb, Kmm_d), Hb.T) + jnp.kron(jnp.eye(M), R)  # [M P, M P]
    Lm = jnp.linalg.cholesky(ks)
    A = jax.scipy.linalg.solve_triangular(Lm, mm(Hb, Kmn_d), lower=True)  # [MP, NL]
    if full_cov:
        fvar = (Knn.reshape(N * L, N * L) - mm(A.T, A)).reshape(N, L, N, L)
    else:
        AtA = jnp.einsum("ka,kb->ab", A, A, precision=hi).reshape(N, L, N, L)
        fvar = Knn - jnp.diagonal(AtA, axis1=0, axis2=2).transpose(2, 0, 1)
    A2 = jax.scipy.linalg.solve_triangular(Lm.T, A, lower=False)
    fmean = mm(A2.T, f.reshape(M * P, 1)).reshape(N, L)
    return fmean, fvar


class ForwardModel:
    """Measurement operator h(x): latent F -> observation space
    (ref: multioutput/utils.py ForwardModel)."""

    def __init__(self, input_dim: int, latent_dim: int, observation_dim: int, *args, **kwargs):
        self.input_dim = input_dim
        self.latent_dim = latent_dim
        self.observation_dim = observation_dim

    def _forward(self, X, F):
        raise NotImplementedError

    def __call__(self, X, F):
        return self._forward(X, F)


class LinearForwardModel(ForwardModel):
    """y = H f, H: [P, L] (ref: multioutput/utils.py LinearForwardModel)."""

    def __init__(self, input_dim: int, latent_dim: int, observation_dim: int, H):
        super().__init__(input_dim, latent_dim, observation_dim)
        H = jnp.asarray(H)
        assert H.shape == (observation_dim, latent_dim), (
            "Tensor H in forward model must be of shape (obs_dim, latent_dim)"
        )
        self.tensor = H

    def _forward(self, X, F):
        return jnp.einsum("pl,...l->...p", self.tensor, jnp.asarray(F))

    def propagate_mean(self, Fmu):
        return self._forward(None, Fmu)

    def propagate_cov(self, Fcov):
        hi = jax.lax.Precision.HIGHEST
        return jnp.matmul(jnp.matmul(self.tensor, jnp.asarray(Fcov), precision=hi),
                          self.tensor.T, precision=hi)


class ForwardModelLikelihood:
    """y = h(x) + eps, eps ~ N(0, R) (ref: multioutput/likelihoods.py:14-37)."""

    def __init__(self, variance, *args, **kwargs):
        self.h = self.get_model(*args, **kwargs)
        assert isinstance(self.h, ForwardModel)
        P = self.h.observation_dim
        if isinstance(variance, (int, float)):
            variance = variance * jnp.eye(P)
        variance = jnp.asarray(variance)
        assert variance.shape == (P, P)
        self.variance = variance
        self.input_dim = self.h.input_dim
        self.latent_dim = self.h.latent_dim
        self.observation_dim = self.h.observation_dim

    def get_model(self, *args, **kwargs) -> ForwardModel:
        raise NotImplementedError


class LinearModelLikelihood(ForwardModelLikelihood):
    """y = Hx + noise (ref: multioutput/likelihoods.py:40-146). Closed-form
    moments/expectations for the linear-Gaussian case."""

    def __init__(self, input_dim: int, variance, forward_model):
        super().__init__(variance, input_dim, forward_model)
        self.H = self.h.tensor

    def get_model(self, input_dim, forward_model):
        if isinstance(forward_model, LinearForwardModel):
            return forward_model
        H = jnp.asarray(forward_model)
        observation_dim, latent_dim = H.shape
        return LinearForwardModel(input_dim, latent_dim, observation_dim, H)

    def variance_at(self, X):
        X = jnp.asarray(X)
        P = self.variance.shape[0]
        return jnp.broadcast_to(self.variance, X.shape[:-1] + (P, P))

    def log_prob(self, X, F, Y):
        return multivariate_gaussian_log_density(Y, self.h(X, F), self.variance)

    def conditional_mean(self, X, F):
        return self.h(X, F)

    def conditional_variance(self, X, F):
        F = jnp.asarray(F)
        return jnp.broadcast_to(jnp.diag(self.variance), F.shape[:-1] + (self.observation_dim,))

    def predict_mean_and_var(self, X, Fmu, Fcov):
        return self.h.propagate_mean(Fmu), self.h.propagate_cov(Fcov) + self.variance

    def predict_log_density(self, X, Fmu, Fcov, Y):
        return multivariate_gaussian_log_density(
            Y, self.h.propagate_mean(Fmu), self.h.propagate_cov(Fcov) + self.variance
        )

    def variational_expectations(self, X, Fmu, Fcov, Y):
        """E_q[log p(y | f)] for q = N(Fmu, Fcov)
        (ref: likelihoods.py:121-141): Gaussian log-density at the
        propagated mean minus half the propagated-covariance trace term."""
        HFmu = self.h.propagate_mean(Fmu)
        HFcovHt = self.h.propagate_cov(Fcov)
        base = multivariate_gaussian_log_density(Y, HFmu, self.variance)
        tr = jnp.trace(jnp.linalg.solve(
            jnp.broadcast_to(self.variance, HFcovHt.shape), HFcovHt),
            axis1=-2, axis2=-1)
        return base - 0.5 * tr


class NonlinearModelLikelihood(ForwardModelLikelihood):
    """y = h(x) + noise for nonlinear h; variational expectations by
    Monte Carlo over q(f) (ref: multioutput/likelihoods.py:149-216; the
    reference draws tf.random normals — here a jax.random key keeps it
    deterministic/jittable)."""

    def __init__(self, forward_model: ForwardModel, variance, num_samples: int = 100, seed: int = 0):
        super().__init__(variance, forward_model)
        self.num_monte_carlo_points = num_samples
        self._key = jax.random.PRNGKey(seed)

    def get_model(self, forward_model):
        return forward_model

    def log_prob(self, X, F, Y):
        return multivariate_gaussian_log_density(Y, self.h(X, F), self.variance)

    def variational_expectations(self, X, Fmu, Fcov, Y):
        Fmu, Fcov = jnp.asarray(Fmu), jnp.asarray(Fcov)
        S = self.num_monte_carlo_points
        N, D = Fmu.shape[-2], Fmu.shape[-1]
        eps = jax.random.normal(self._key, (S, N, D), dtype=Fmu.dtype)
        Lc = jnp.linalg.cholesky(Fcov)
        samples = Fmu[None] + jnp.einsum("nde,sne->snd", Lc, eps)
        lp = multivariate_gaussian_log_density(
            jnp.broadcast_to(Y, (S,) + Y.shape), self.h(X, samples), self.variance
        )
        return jnp.mean(lp, axis=0)


# reference class-name aliases (ref: multioutput/gpr.py:14,82)
MultioutputGPR = MultioutputGPRModel
MultioutputSVGP = MultioutputSVGPModel
