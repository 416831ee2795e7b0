"""Batched expert execution: one XLA program per shape bucket.

Replaces the reference's serial per-expert loop
(ref: GPSat/local_experts.py:930-1260: build model -> optimise -> predict,
one scipy session + one TF graph per expert) with:

    shard_map over a device mesh ('experts' axis)
      -> vmap over the local expert tiles
        -> jitted L-BFGS on the masked LML + masked posterior predict

Experts are embarrassingly independent (SURVEY.md §2.9), so there are no
collectives inside optimization; each device runs its local while_loop to
its own trip count. Dead tiles (mask all-zero) make batches divide the mesh
evenly and are dropped on host afterwards.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpsat_tpu.models import gpr as gpr_core
from gpsat_tpu.optim.lbfgs import minimize_lbfgs
from gpsat_tpu.parallel.batching import TileBatch, pad_batch_to


def default_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; axis name 'experts'."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices, axis_names=("experts",))


def _fit_predict_one(
    data: Dict[str, jnp.ndarray],
    Xnew: jnp.ndarray,
    uparams0: Dict[str, jnp.ndarray],
    *,
    kernel: str,
    bijectors: dict,
    fixed_params: tuple,
    jitter: float,
    max_iter: int,
    optimise: bool,
    tol_grad: float,
    tol_f: float,
):
    """Single padded tile: optimise hyperparameters then predict."""
    u_free0 = {k: v for k, v in uparams0.items() if k not in fixed_params}
    u_fixed = {k: v for k, v in uparams0.items() if k in fixed_params}

    def objective(u_free):
        return gpr_core.neg_lml({**u_free, **u_fixed}, data, kernel=kernel, bijectors=bijectors, jitter=jitter)

    if optimise and u_free0:
        res = minimize_lbfgs(
            objective, u_free0, max_iter=max_iter, tol_grad=tol_grad, tol_f=tol_f
        )
        u_opt = {**res.params, **u_fixed}
        converged = res.converged
        num_iter = res.num_iter
        final_obj = res.final_value
    else:
        u_opt = uparams0
        converged = jnp.asarray(True)
        num_iter = jnp.asarray(0)
        final_obj = objective(u_free0) if u_free0 else gpr_core.neg_lml(
            uparams0, data, kernel=kernel, bijectors=bijectors, jitter=jitter
        )

    cparams = {k: bijectors[k].forward(v) for k, v in u_opt.items()}
    pred = gpr_core.predict(cparams, data, Xnew, kernel=kernel, jitter=jitter)
    return {
        "params": cparams,
        "pred": pred,
        "objective": final_obj,
        "converged": converged,
        "num_iter": num_iter,
    }


def make_batched_runner(
    *,
    kernel: str = "Matern32",
    bijectors: Optional[dict] = None,
    fixed_params: tuple = (),
    jitter: float = 0.0,
    max_iter: int = 500,
    optimise: bool = True,
    tol_grad: float = 1e-6,
    tol_f: float = 1e-11,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Build the jitted batch program: (batch arrays, uparams0[B]) -> results.

    With a mesh, the expert axis is sharded via shard_map so each device
    optimizes its local tiles with no cross-device synchronization.
    """
    from gpsat_tpu.ops import transforms as T

    if bijectors is None:
        bijectors = {name: T.POSITIVE for name in gpr_core.PARAM_NAMES}

    one = functools.partial(
        _fit_predict_one,
        kernel=kernel,
        bijectors=bijectors,
        fixed_params=tuple(fixed_params),
        jitter=jitter,
        max_iter=max_iter,
        optimise=optimise,
        tol_grad=tol_grad,
        tol_f=tol_f,
    )

    def batched(X, y, mask, Xnew, uparams0):
        data = {"X": X, "y": y, "mask": mask}
        return jax.vmap(lambda d, xn, u: one({k: v for k, v in d.items()}, xn, u))(
            data, Xnew, uparams0
        )

    if mesh is None:
        return jax.jit(batched)

    spec = P("experts")
    shard_map = jax.shard_map

    sharded = shard_map(
        batched,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=spec,
        # optax's linesearch cond mixes literal-constant and input-derived
        # branches, which trips the varying-manual-axes check; semantics are
        # still per-shard independent, so disable the check
        check_vma=False,
    )
    return jax.jit(sharded)


def run_tile_batch(
    batch: TileBatch,
    init_params: Dict[str, np.ndarray],
    runner: Callable,
    *,
    mesh: Optional[Mesh] = None,
    bijectors: Optional[dict] = None,
) -> Dict[str, np.ndarray]:
    """Execute one shape bucket; returns host-side arrays [B, ...].

    init_params: constrained params, each broadcastable to [B, ...]
    (lengthscales [B, D] or [D]; variances [B] or scalar).
    """
    from gpsat_tpu.ops import transforms as T

    if bijectors is None:
        bijectors = {name: T.POSITIVE for name in gpr_core.PARAM_NAMES}

    B = batch.B
    if mesh is not None:
        n_dev = int(np.prod([mesh.devices.size]))
        B_pad = int(-(-B // n_dev) * n_dev)
        batch = pad_batch_to(batch, B_pad)

    D = batch.X.shape[-1]
    dtype = batch.X.dtype

    def bcast(v, trailing):
        v = np.asarray(v, dtype=dtype)
        target = (batch.B,) + trailing
        return np.broadcast_to(v, target).copy()

    cparams0 = {
        "lengthscales": bcast(init_params.get("lengthscales", np.ones(D)), (D,)),
        "kernel_variance": bcast(init_params.get("kernel_variance", 1.0), ()),
        "likelihood_variance": bcast(init_params.get("likelihood_variance", 1.0), ()),
    }
    uparams0 = {k: np.asarray(bijectors[k].inverse(jnp.asarray(v))) for k, v in cparams0.items()}

    out = runner(
        jnp.asarray(batch.X),
        jnp.asarray(batch.y),
        jnp.asarray(batch.mask),
        jnp.asarray(batch.Xnew),
        {k: jnp.asarray(v) for k, v in uparams0.items()},
    )
    out = jax.tree_util.tree_map(np.asarray, out)

    # strip dead-tile padding
    live = batch.expert_index >= 0
    res = {
        "expert_index": batch.expert_index[live],
        "num_obs": batch.num_obs[live],
        "lengthscales": out["params"]["lengthscales"][live],
        "kernel_variance": out["params"]["kernel_variance"][live],
        "likelihood_variance": out["params"]["likelihood_variance"][live],
        "objective": out["objective"][live],
        "converged": out["converged"][live],
        "num_iter": out["num_iter"][live],
        "f_mean": out["pred"]["f_mean"][live],
        "f_var": out["pred"]["f_var"][live],
        "y_var": out["pred"]["y_var"][live],
        "pred_mask": batch.pred_mask[live],
        "obs_mean": batch.obs_mean[live],
    }
    return res
