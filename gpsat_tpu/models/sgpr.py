"""Sparse GPR (Titsias 2009 collapsed ELBO) — functional core + host model.

TPU-native analogue of GPflowSGPRModel (ref:
GPSat/models/gpflow_models.py:666-901): M inducing points initialised as a
random subset of the training inputs (:804-819), collapsed-ELBO objective
(:860-862), optional inducing-point training (:864-901), predict inherits
the GPR dict contract. O(NM^2) compute / O(NM) memory (:672-681).

Masked-tile semantics for batching: padded *observation* rows have their
Kuf columns zeroed, so they vanish from every data-dependent term; padded
*inducing* slots (tiles with n < M) are placed far outside the data's
bounding box, where Kuf ~ 0 and Kuu is diagonal — they contribute nothing
to the bound or the posterior but keep Kuu well-conditioned with a static
M per bucket (the reference instead shrinks M per expert, which would be a
dynamic shape).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpsat_tpu.models.gpr import GPRModel
from gpsat_tpu.ops import kernels as K
from gpsat_tpu.ops import linalg as LA
from gpsat_tpu.ops import transforms as T

PARAM_NAMES = ["lengthscales", "kernel_variance", "likelihood_variance", "inducing_points"]
DEFAULT_JITTER = 1e-6  # gpflow default_jitter on Kuu


# N-threshold above which the [M, N] factor is accumulated chunk-by-chunk
# instead of materialized (the large-N tile regime: the reference claims
# SGPR handles ~O(1e5) points/expert, ref: gpflow_models.py:672-681 — at
# B=64, N=1e5, M=500 a materialized Kuf would be 12.8 GB f32 per batch)
CHUNK_THRESHOLD = 8192
DEFAULT_CHUNK = 4096


def _chunk_remat() -> bool:
    """Trace-time gate: rematerialize chunk forwards in the backward pass
    (default). GPSAT_CHUNK_REMAT=0 trades HBM for the recompute FLOPs."""
    import os

    return os.environ.get("GPSAT_CHUNK_REMAT", "1") != "0"


def _resolve_chunk(N: int, chunk_size) -> int:
    """0/None = never chunk; 'auto' = chunk when N >= CHUNK_THRESHOLD.
    Shapes are static under jit, so this is a trace-time decision."""
    if chunk_size in (None, 0):
        return 0
    if chunk_size == "auto":
        return DEFAULT_CHUNK if N >= CHUNK_THRESHOLD else 0
    return int(chunk_size)


def _common_terms(cparams: dict, data: dict, *, kernel: str, jitter: float, chunk_size=None):
    """Shared SGPR factors: L = chol(Kuu), A = L^-1 Kuf / sigma, B-factors.

    Returns L, LB, c plus the scalar data summaries the bound needs
    (n = sum(mask), ymsq = sum((y*m)^2), trAAT). With chunking active the
    [M, N] matrices A/Kuf only ever exist one [M, C] chunk at a time,
    accumulated by a rematerialized lax.scan — peak memory O(M^2 + M*C)
    instead of O(M*N), gradients recompute the chunk forward (remat) so
    backward memory stays flat too.
    """
    from gpsat_tpu.models import means as MF

    X, y, m = data["X"], data["y"], data["mask"].astype(data["X"].dtype)
    # trainable prior mean (Constant/Linear): collapsed bound on centered
    # obs (ref: gpflow_models.py:706 mean_function on SGPR)
    y = y - MF.mean_value(cparams, X) if MF.has_mean(cparams) else y
    Z = cparams["inducing_points"]
    ls = cparams["lengthscales"]
    kv = cparams["kernel_variance"]
    sigma2 = cparams["likelihood_variance"]
    sigma = jnp.sqrt(sigma2)

    Kuu = K.gram(kernel, Z, Z, ls, kv)
    Kuu = LA.add_diag(Kuu, jitter)
    M = Z.shape[0]
    N = X.shape[0]
    C = _resolve_chunk(N, chunk_size)

    # f32 fast path: materialize W = L^-1 once (blocked, matmul-rich) so
    # every chunk's A_i = W Kuf_i is an MXU matmul instead of an M-step
    # sequential triangular solve — L is constant across chunks, so the
    # solve work was being repeated n_chunks times. With GPSAT_BLOCK_CHOL
    # the (L, W) pair comes from the fused diag-block Pallas walk
    # (differentiable chol_winv — SGPR gradients flow through the factor).
    use_block = LA.use_fast_inverse(X.dtype) and (
        LA.block_path_enabled(Kuu, pad_ok=True) or LA.recursive_pair_enabled(Kuu)
    )
    if use_block:
        L, Winv = LA.chol_winv_padded(Kuu)
    elif LA.use_fast_inverse(X.dtype):
        L = LA.cholesky(Kuu)
        Winv = LA.tri_inv_blocked(L)
    else:
        L = LA.cholesky(Kuu)
        Winv = None

    if Winv is not None:
        def solve_L(R):
            return jnp.matmul(Winv, R, precision=jax.lax.Precision.HIGHEST)
    else:
        def solve_L(R):
            return LA.tri_solve(L, R)

    if C and N > C:
        # pad N up to a chunk multiple; padded rows carry mask 0 so their
        # Kuf columns vanish exactly like engine-level tile padding
        pad = (-N) % C
        if pad:
            X = jnp.pad(X, ((0, pad), (0, 0)))
            y = jnp.pad(y, (0, pad))
            m = jnp.pad(m, (0, pad))
        nc = (N + pad) // C
        Xc = X.reshape(nc, C, X.shape[-1])
        ymc = (y * m).reshape(nc, C)
        mc = m.reshape(nc, C)

        # the N-contraction matmuls (2*M^2*C FLOPs each) dominate large-N
        # cost and feed B = AAT + I (eigenvalues >= 1, conditioning-safe):
        # they may run at the relaxed accumulation precision (ops/precision)
        from gpsat_tpu.ops.precision import accum_precision

        acc = accum_precision()

        def body(carry, inp):
            AAT_, Aerr_, ymsq_ = carry
            Xi, ymi, mi = inp
            Kuf_i = K.gram(kernel, Z, Xi, ls, kv) * mi[None, :]
            if LA.use_fast_inverse(X.dtype):
                A_i = jnp.matmul(Winv, Kuf_i, precision=acc) / sigma
            else:
                A_i = solve_L(Kuf_i) / sigma
            return (
                AAT_ + jnp.matmul(A_i, A_i.T, precision=acc),
                Aerr_ + jnp.matmul(A_i, ymi[:, None], precision=acc),
                ymsq_ + jnp.sum(ymi**2),
            ), None

        init = (
            jnp.zeros((M, M), dtype=X.dtype),
            jnp.zeros((M, 1), dtype=X.dtype),
            jnp.zeros((), dtype=X.dtype),
        )
        # remat (default) recomputes each chunk's forward during backward:
        # peak memory stays O(M*C) but costs ~1/3 extra FLOPs. With
        # GPSAT_CHUNK_REMAT=0 the scan stashes per-chunk residuals instead
        # (~O(M*N) total) — worth it when the batch is small enough that
        # HBM has room (bench_large_n --chunk-sweep measures the trade).
        body_fn = jax.checkpoint(body) if _chunk_remat() else body
        (AAT, Aerr, ymsq), _ = jax.lax.scan(body_fn, init, (Xc, ymc, mc))
    else:
        Kuf = K.gram(kernel, Z, X, ls, kv) * m[None, :]
        A = solve_L(Kuf) / sigma
        AAT = A @ A.T
        ym = y * m
        Aerr = A @ ym[:, None]
        ymsq = jnp.sum(ym**2)

    B = AAT + jnp.eye(M, dtype=X.dtype)
    if use_block:
        LB, WB = LA.chol_winv_padded(B)
        c = jnp.matmul(WB, Aerr, precision=jax.lax.Precision.HIGHEST) / sigma
    elif LA.use_fast_inverse(X.dtype):
        # f32 fast path (block kernel off): materialize WB = LB^-1 blocked
        # so the per-iteration c-solve (and its autodiff backward) and the
        # predict solves are matmuls instead of M-step sequential walks —
        # the same trade tri_inv_blocked makes for the Kuu factor above
        LB = LA.cholesky(B)
        WB = LA.tri_inv_blocked(LB)
        c = jnp.matmul(WB, Aerr, precision=jax.lax.Precision.HIGHEST) / sigma
    else:
        LB, WB = LA.cholesky(B), None
        c = LA.tri_solve(LB, Aerr) / sigma
    return dict(
        L=L, AAT=AAT, LB=LB, c=c, n=jnp.sum(m), ymsq=ymsq, sigma2=sigma2, kv=kv,
        Winv=Winv, WB=WB,
    )


def elbo(cparams: dict, data: dict, *, kernel: str, jitter: float = DEFAULT_JITTER, chunk_size=None):
    """Titsias collapsed evidence lower bound on one padded tile."""
    t = _common_terms(cparams, data, kernel=kernel, jitter=jitter, chunk_size=chunk_size)
    n = t["n"]
    out = -0.5 * n * jnp.log(2.0 * jnp.pi)
    out -= jnp.sum(jnp.log(jnp.diagonal(t["LB"])))
    out -= 0.5 * n * jnp.log(t["sigma2"])
    out -= 0.5 * t["ymsq"] / t["sigma2"]
    out += 0.5 * jnp.sum(t["c"] ** 2)
    # trace correction: -1/(2 s2) tr(Kff) + 1/2 tr(AAT)
    out -= 0.5 * n * t["kv"] / t["sigma2"]
    out += 0.5 * jnp.trace(t["AAT"])
    return out


def neg_elbo(uparams: dict, data: dict, *, kernel: str, bijectors: dict, jitter: float = DEFAULT_JITTER, chunk_size=None):
    p = T.forward_params(uparams, bijectors)
    return -elbo(p, data, kernel=kernel, jitter=jitter, chunk_size=chunk_size)


def predict(
    cparams: dict,
    data: dict,
    Xnew: jnp.ndarray,
    *,
    kernel: str,
    jitter: float = DEFAULT_JITTER,
    chunk_size=None,
    full_cov: bool = False,
):
    """SGPR posterior mean/variance at Xnew (gpflow predict_f equations).

    full_cov=True additionally returns the posterior covariance ``f_cov``
    (ref: GPSat/models/gpflow_models.py:230-260 via gpflow predict_f)."""
    t = _common_terms(cparams, data, kernel=kernel, jitter=jitter, chunk_size=chunk_size)
    Z = cparams["inducing_points"]
    Kus = K.gram(kernel, Z, Xnew, cparams["lengthscales"], cparams["kernel_variance"])
    from gpsat_tpu.models import means as MF

    if t["WB"] is not None:
        hi = jax.lax.Precision.HIGHEST
        tmp1 = jnp.matmul(t["Winv"], Kus, precision=hi)
        tmp2 = jnp.matmul(t["WB"], tmp1, precision=hi)
    else:
        tmp1 = LA.tri_solve(t["L"], Kus)
        tmp2 = LA.tri_solve(t["LB"], tmp1)
    f_mean = MF.add_mean(cparams, Xnew, (tmp2.T @ t["c"])[:, 0])
    kss = K.gram_diag(kernel, Xnew, cparams["kernel_variance"])
    f_var = kss + jnp.sum(tmp2**2, axis=0) - jnp.sum(tmp1**2, axis=0)
    out = {"f_mean": f_mean, "f_var": f_var, "y_var": f_var + cparams["likelihood_variance"]}
    if full_cov:
        Kss = K.gram(kernel, Xnew, Xnew, cparams["lengthscales"], cparams["kernel_variance"])
        out["f_cov"] = Kss + tmp2.T @ tmp2 - tmp1.T @ tmp1
    return out


def pad_inducing_points(Z: np.ndarray, M: int, data_span: float = 1.0) -> np.ndarray:
    """Pad an [m, D] inducing set to [M, D] with distinct far-away points.

    Pads are decoupled (kernel ~ 0 to data and to each other) yet kept at
    MODERATE distance: the |a|^2+|b|^2-2ab squared-distance trick loses
    ~|z|^2 * eps to roundoff, so f32 pads at 1e6*span used to corrupt the
    Kuu diagonal (error >> true 0) and make Cholesky NaN. 100*span base +
    10*span spacing keeps pads inert even when the optimized lengthscale
    grows to several spans (pad-data distance >= 100 spans => kernel ~ 0
    for lengthscales up to ~20 spans) while f32 roundoff on the scaled
    distances stays well below the inter-pad separations.
    """
    m, D = Z.shape
    if m >= M:
        return Z[:M]
    span = max(data_span, 1.0)
    far_base = Z.max(axis=0) if m else np.zeros(D)
    extra = np.arange(M - m, dtype=float)[:, None] * (10.0 * span)
    pad = far_base[None, :] + 100.0 * span + extra
    return np.concatenate([Z, pad], axis=0)


class SGPRModel(GPRModel):
    """Host-facing sparse GPR expert (reference GPflowSGPRModel contract)."""

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
        num_inducing_points: int = 500,
        kernel_kwargs: Optional[dict] = None,
        noise_variance: Optional[float] = None,
        jitter: float = DEFAULT_JITTER,
        chunk_size="auto",
        **kwargs,
    ):
        self.chunk_size = chunk_size
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
            kernel=kernel,
            kernel_kwargs=kernel_kwargs,
            noise_variance=noise_variance,
            jitter=jitter,
            **kwargs,
        )
        assert num_inducing_points is not None, "num_inducing_points must be specified for SGPR"
        if len(self.coords) < num_inducing_points:
            # fewer points than M: inducing points = data (ref: :810-815)
            Z = np.array(self.coords, copy=True)
        else:
            Z = np.array(self.coords, copy=True)
            np.random.shuffle(Z)
            Z = Z[:num_inducing_points]
        self._params["inducing_points"] = Z
        self._bijectors["inducing_points"] = T.IDENTITY

    @property
    def param_names(self) -> List[str]:
        names = list(PARAM_NAMES)
        for p in ("mean_c", "mean_A"):
            if p in getattr(self, "_params", {}):
                names.append(p)
        return names

    def _neg_objective(self, uparams, data):
        return neg_elbo(
            uparams, data, kernel=self.kernel, bijectors=self._bijectors,
            jitter=self.jitter, chunk_size=self.chunk_size,
        )

    def optimise_parameters(self, train_inducing_points: bool = False, max_iter: int = 10_000, fixed_params=None, **opt_kwargs) -> bool:
        fixed_params = list(fixed_params or [])
        if not train_inducing_points and "inducing_points" not in fixed_params:
            fixed_params.append("inducing_points")

        from gpsat_tpu.optim.lbfgs import minimize_lbfgs

        data = self._data_dict()
        bijectors = self._bijectors
        u_all = {k: bijectors[k].inverse(jnp.asarray(v)) for k, v in self._params.items()}
        u_free = {k: v for k, v in u_all.items() if k not in fixed_params}
        u_fixed = {k: v for k, v in u_all.items() if k in fixed_params}

        def objective(u_free_):
            return self._neg_objective({**u_free_, **u_fixed}, data)

        res = minimize_lbfgs(objective, u_free, max_iter=max_iter, **opt_kwargs)
        u_opt = {**{k: np.asarray(v) for k, v in res.params.items()}, **{k: np.asarray(v) for k, v in u_fixed.items()}}
        self._params = {k: np.asarray(bijectors[k].forward(jnp.asarray(v))) for k, v in u_opt.items()}
        self._last_opt_result = res
        return bool(np.asarray(res.converged))

    def get_objective_function_value(self) -> float:
        """ELBO (not negated — matches reference SGPR, gpflow_models.py:860-862)."""
        cparams = {k: jnp.asarray(v) for k, v in self._params.items()}
        return float(np.asarray(elbo(
            cparams, self._data_dict(), kernel=self.kernel, jitter=self.jitter,
            chunk_size=self.chunk_size,
        )))

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
            cparams, self._data_dict(), jnp.asarray(coords), kernel=self.kernel,
            jitter=self.jitter, chunk_size=self.chunk_size, full_cov=full_cov,
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

    def get_inducing_points(self) -> np.ndarray:
        return np.asarray(self._params["inducing_points"])

    def set_inducing_points(self, inducing_points):
        self._params["inducing_points"] = np.asarray(inducing_points, dtype=float)


def make_sgpr_core(
    kernel: str = "Matern32",
    bijectors: Optional[dict] = None,
    jitter: float = DEFAULT_JITTER,
    num_inducing_points: int = 500,
    train_inducing_points: bool = False,
    mean_function: Optional[str] = None,
    chunk_size="auto",
):
    """Functional core for the batched engine.

    Inducing points ride in cparams with an identity bijector; they are in
    fixed_params unless train_inducing_points.

    chunk_size: 'auto' (default) accumulates the [M, N] factor in
    [M, 4096] chunks once tiles reach N >= 8192, entering the large-N
    regime (N up to ~1e5/tile, ref: gpflow_models.py:672-681) without
    materializing [B, M, N]; an int forces that chunk size; None/0
    disables chunking.
    """
    from gpsat_tpu.models import means as MF
    from gpsat_tpu.models.functional import ModelCore

    if bijectors is None:
        bijectors = {name: T.POSITIVE for name in PARAM_NAMES}
    MF.validate(mean_function)
    bijectors = dict(bijectors)
    bijectors["inducing_points"] = T.IDENTITY
    for p in MF.mean_param_names(mean_function):
        bijectors.setdefault(p, T.IDENTITY)

    def objective(uparams, data):
        return neg_elbo(uparams, data, kernel=kernel, bijectors=bijectors, jitter=jitter, chunk_size=chunk_size)

    def predict_fn(cparams, data, Xnew):
        return predict(cparams, data, Xnew, kernel=kernel, jitter=jitter, chunk_size=chunk_size)

    def forward(uparams):
        return {k: bijectors[k].forward(v) for k, v in uparams.items()}

    def inverse(cparams):
        return {k: bijectors[k].inverse(jnp.asarray(v)) for k, v in cparams.items()}

    def init_cparams(D: int, dtype=np.float64, overrides: Optional[dict] = None) -> Dict[str, np.ndarray]:
        out = {
            "lengthscales": np.ones((D,), dtype=dtype),
            "kernel_variance": np.asarray(1.0, dtype=dtype),
            "likelihood_variance": np.asarray(1.0, dtype=dtype),
            "inducing_points": np.zeros((num_inducing_points, D), dtype=dtype),
        }
        out.update(MF.mean_param_defaults(mean_function, D, dtype=dtype))
        for k, v in (overrides or {}).items():
            if k in out:
                v = np.asarray(v, dtype=dtype)
                out[k] = np.broadcast_to(v, out[k].shape).copy() if v.shape != out[k].shape else v
        return out

    def prepare_batch_init(batch, init):
        """Per-tile inducing init: random subset of the tile's valid points
        (ref: gpflow_models.py:804-819), far-point padded to a static M."""
        if "inducing_points" in init and np.ndim(init["inducing_points"]) == 3:
            return init
        rng = np.random.default_rng(0)
        B, _, D = batch.X.shape
        span = float(np.max(np.abs(batch.X))) + 1.0
        Z = np.zeros((B, num_inducing_points, D), dtype=batch.X.dtype)
        for bi in range(B):
            n = int(batch.mask[bi].sum())
            pts = batch.X[bi, :n]
            if n >= num_inducing_points:
                sel = rng.choice(n, num_inducing_points, replace=False)
                Z[bi] = pts[sel]
            else:
                Z[bi] = pad_inducing_points(pts, num_inducing_points, data_span=span)
        return {**init, "inducing_points": Z}

    return ModelCore(
        name=f"SGPR[{kernel},M={num_inducing_points}]",
        objective=objective,
        predict=predict_fn,
        forward=forward,
        inverse=inverse,
        init_cparams=init_cparams,
        param_names=tuple(PARAM_NAMES) + MF.mean_param_names(mean_function),
        default_fixed_params=() if train_inducing_points else ("inducing_points",),
        prepare_batch_init=prepare_batch_init,
    )
