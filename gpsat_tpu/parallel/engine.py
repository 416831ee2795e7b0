"""Batched expert execution: one XLA program per shape bucket.

Replaces the reference's serial per-expert loop
(ref: GPSat/local_experts.py:930-1260: build model -> optimise -> predict,
one scipy session + one TF graph per expert) with:

    shard_map over a device mesh ('experts' axis)
      -> vmap over the local expert tiles
        -> jitted L-BFGS on the masked objective + masked posterior predict

Experts are embarrassingly independent (SURVEY.md §2.9), so there are no
collectives inside optimization; each device runs its local while_loop to
its own trip count. Dead tiles (mask all-zero) make batches divide the mesh
evenly and are dropped on host afterwards.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gpsat_tpu.models.functional import ModelCore
from gpsat_tpu.optim.lbfgs import minimize_lbfgs
from gpsat_tpu.parallel.batching import TileBatch, pad_batch_to


def default_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; axis name 'experts'."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices, axis_names=("experts",))


def _fit_predict_one(
    core: ModelCore,
    data: Dict[str, jnp.ndarray],
    Xnew: jnp.ndarray,
    uparams0: Dict[str, jnp.ndarray],
    *,
    fixed_params: tuple,
    max_iter: int,
    optimise: bool,
    tol_grad: float,
    tol_f: float,
    linesearch: str = "zoom",
    max_linesearch_steps: int = 32,
    memory_size: int = 10,
    init_state=None,
    return_state: bool = False,
):
    """Single padded tile: optimise parameters then predict."""
    if optimise and core.device_init is not None:
        uparams0 = core.device_init(uparams0, data)
    u_free0 = {k: v for k, v in uparams0.items() if k not in fixed_params}
    u_fixed = {k: v for k, v in uparams0.items() if k in fixed_params}

    def objective(u_free):
        return core.objective({**u_free, **u_fixed}, data)

    state = None
    if optimise and u_free0:
        res = minimize_lbfgs(
            objective, u_free0, max_iter=max_iter, tol_grad=tol_grad, tol_f=tol_f,
            linesearch=linesearch, max_linesearch_steps=max_linesearch_steps,
            memory_size=memory_size,
            init_state=init_state, return_state=return_state,
        )
        if return_state:
            res, state = res
        u_opt = {**res.params, **u_fixed}
        converged = res.converged
        num_iter = res.num_iter
        final_obj = res.final_value
        stalled = res.stalled
        failed = res.failed
    else:
        u_opt = uparams0
        converged = jnp.asarray(True)
        num_iter = jnp.asarray(0)
        final_obj = (core.report_objective or core.objective)(uparams0, data)
        stalled = jnp.asarray(False)
        failed = jnp.asarray(False)

    cparams = core.forward(u_opt)
    if optimise and core.finalize_params is not None:
        cparams = core.finalize_params(cparams, data)
    pred = core.predict(cparams, data, Xnew)
    out = {
        "params": cparams,
        "pred": pred,
        "objective": final_obj,
        "converged": converged,
        "num_iter": num_iter,
        "stalled": stalled,
        # linesearch collapse / non-finite objective — the third exit
        # class next to converged and stalled (benchmark rows surface it
        # as failed_exits so straggler lanes self-explain)
        "failed": failed,
    }
    if return_state and state is not None:
        out["opt_state"] = state
    return out


def make_batched_runner(
    core: ModelCore,
    *,
    fixed_params: tuple = (),
    max_iter: int = 500,
    optimise: bool = True,
    tol_grad: Optional[float] = None,
    tol_f: Optional[float] = None,
    linesearch: Optional[str] = None,
    max_linesearch_steps: int = 32,
    memory_size: int = 10,
    mesh: Optional[Mesh] = None,
    return_state: bool = False,
    take_state: bool = False,
) -> Callable:
    """Build the jitted batch program: (batch arrays, uparams0[B]) -> results.

    return_state=True adds the resumable L-BFGS carry to the outputs
    (single_eval only); take_state=True makes the program accept that
    carry as a sixth argument and RESUME from it instead of starting
    fresh — the state-carrying unconverged-lane compaction
    (run_tile_batch_carry).

    With a mesh, the expert axis is sharded via shard_map so each device
    optimizes its local tiles with no cross-device synchronization.

    tol_grad/tol_f default by compute dtype: 1e-6/1e-11 in f64 (scipy
    L-BFGS-B parity) but 1e-3/1e-6 in f32 — the f64-grade thresholds sit
    below f32 arithmetic noise, so lanes burn iterations (and under vmap
    the whole batch pays for the slowest lane) chasing unreachable
    decreases.

    linesearch also defaults by compute dtype when None: "zoom"
    (strong-Wolfe, scipy-parity) in f64 but "single_eval" (one fused
    value+grad per iteration — the measured TPU throughput winner, see
    docs/architecture.md) in f32, so the production path is fast out of
    the box without optim_kwargs.
    """

    def batched(X, y, mask, Xnew, uparams0, state=None):
        f32 = jnp.dtype(X.dtype) == jnp.float32
        tg = tol_grad if tol_grad is not None else (1e-3 if f32 else 1e-6)
        tf = tol_f if tol_f is not None else (1e-6 if f32 else 1e-11)
        ls = linesearch if linesearch is not None else ("single_eval" if f32 else "zoom")

        def one(d, xn, u, st=None):
            return _fit_predict_one(
                core,
                d,
                xn,
                u,
                fixed_params=tuple(fixed_params),
                max_iter=max_iter,
                optimise=optimise,
                tol_grad=tg,
                tol_f=tf,
                linesearch=ls,
                max_linesearch_steps=max_linesearch_steps,
                memory_size=memory_size,
                init_state=st,
                return_state=return_state,
            )

        if state is not None:
            return jax.vmap(one)({"X": X, "y": y, "mask": mask}, Xnew, uparams0, state)
        return jax.vmap(lambda d, xn, u: one(d, xn, u))({"X": X, "y": y, "mask": mask}, Xnew, uparams0)

    if take_state:
        fn = lambda X, y, mask, Xnew, uparams0, state: batched(X, y, mask, Xnew, uparams0, state)  # noqa: E731
        n_args = 6
    else:
        fn = lambda X, y, mask, Xnew, uparams0: batched(X, y, mask, Xnew, uparams0)  # noqa: E731
        n_args = 5
    if mesh is None:
        return jax.jit(fn)

    spec = P("experts")
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec,) * n_args,
        out_specs=spec,
        # optax's linesearch cond mixes literal-constant and input-derived
        # branches, which trips the varying-manual-axes check; semantics are
        # still per-shard independent, so disable the check
        check_vma=False,
    )
    return jax.jit(sharded)


def _adam_fit_predict_one(
    core: ModelCore,
    data: Dict[str, jnp.ndarray],
    Xnew: jnp.ndarray,
    uparams0: Dict[str, jnp.ndarray],
    *,
    fixed_params: tuple,
    max_iter: int,
    optimise: bool,
    learning_rate: float,
    check_every: int,
    persistence: int,
):
    """Adam optimization for stochastic cores (SVGP): early stopping with
    the reference's check_every/persistence semantics
    (ref: gpflow_models.py:1214-1245), fully inside jit. Cores with a
    natgrad_update hook get the reference's hybrid optimizer: the
    variational params step by natural gradient each iteration and are
    excluded from Adam (ref: gpflow_models.py:1186-1212)."""
    import optax

    if optimise and core.device_init is not None:
        uparams0 = core.device_init(uparams0, data)
    nat_names = tuple(core.natgrad_params) if core.natgrad_update is not None else ()
    u_nat0 = {k: v for k, v in uparams0.items() if k in nat_names}
    u_free0 = {k: v for k, v in uparams0.items() if k not in fixed_params and k not in nat_names}
    u_fixed = {k: v for k, v in uparams0.items() if k in fixed_params and k not in nat_names}

    def loss_fn(u_free, u_nat):
        return core.objective({**u_free, **u_nat, **u_fixed}, data)

    # nat params still need fitting even when every Adam param is fixed
    # (e.g. re-running with smoothed, fixed hyperparameters)
    if optimise and (u_free0 or nat_names):
        opt = optax.adam(learning_rate)

        def cond(carry):
            _, _, _, it, best, since_best, done = carry
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        def body(carry):
            u, u_nat, opt_state, it, best, since_best, done = carry
            if nat_names:
                u_nat = core.natgrad_update({**u, **u_nat, **u_fixed}, data)
            loss, g = jax.value_and_grad(loss_fn)(u, u_nat)
            updates, opt_state = opt.update(g, opt_state)
            u = optax.apply_updates(u, updates)
            check = (it % check_every) == 0
            improved = loss < best
            best = jnp.where(check & improved, loss, best)
            since_best = jnp.where(check, jnp.where(improved, 0, since_best + check_every), since_best)
            done = jnp.logical_or(since_best >= persistence, jnp.logical_not(jnp.isfinite(loss)))
            return (u, u_nat, opt_state, it + 1, best, since_best, done)

        init = (
            u_free0, u_nat0, opt.init(u_free0),
            jnp.asarray(0), jnp.asarray(jnp.inf), jnp.asarray(0), jnp.asarray(False),
        )
        u_opt_free, u_opt_nat, _, it, best, _, _ = jax.lax.while_loop(cond, body, init)
        u_opt = {**u_opt_free, **u_opt_nat, **u_fixed}
        final_obj = loss_fn(u_opt_free, u_opt_nat)
        converged = jnp.isfinite(final_obj)
        num_iter = it
    else:
        u_opt = uparams0
        final_obj = (core.report_objective or core.objective)(uparams0, data)
        converged = jnp.asarray(True)
        num_iter = jnp.asarray(0)

    cparams = core.forward(u_opt)
    if optimise and core.finalize_params is not None:
        cparams = core.finalize_params(cparams, data)
    pred = core.predict(cparams, data, Xnew)
    return {
        "params": cparams,
        "pred": pred,
        "objective": final_obj,
        "converged": converged,
        "num_iter": num_iter,
        # Adam's persistence-based early stop IS its convergence criterion
        "stalled": jnp.asarray(False),
        "failed": jnp.logical_not(jnp.isfinite(final_obj)),
    }


def make_batched_adam_runner(
    core: ModelCore,
    *,
    fixed_params: tuple = (),
    max_iter: int = 2000,
    optimise: bool = True,
    learning_rate: float = 1e-2,
    check_every: int = 10,
    persistence: int = 100,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Adam analogue of make_batched_runner, for stochastic cores (SVGP)."""

    def batched(X, y, mask, Xnew, uparams0):
        def one(d, xn, u):
            return _adam_fit_predict_one(
                core,
                d,
                xn,
                u,
                fixed_params=tuple(fixed_params),
                max_iter=max_iter,
                optimise=optimise,
                learning_rate=learning_rate,
                check_every=check_every,
                persistence=persistence,
            )

        return jax.vmap(one)({"X": X, "y": y, "mask": mask}, Xnew, uparams0)

    if mesh is None:
        return jax.jit(batched)
    spec = P("experts")
    return jax.jit(
        jax.shard_map(batched, mesh=mesh, in_specs=(spec,) * 5, out_specs=spec, check_vma=False)
    )


def _smart_init(batch: TileBatch) -> Dict[str, np.ndarray]:
    """Data-driven per-tile initialization: lengthscales from the masked
    coordinate spread, variances from the observed variance. Cuts L-BFGS
    iterations ~5-10x vs unit init (see bench history) at the cost of a
    documented divergence from the reference's fixed unit init."""
    m = batch.mask > 0
    Xm = np.where(m[..., None], batch.X, np.nan)
    ym = np.where(m, batch.y, np.nan)
    with np.errstate(all="ignore"):
        ls = np.nanstd(Xm, axis=1)
        var_y = np.nanvar(ym, axis=1)
    ls = np.where(np.isfinite(ls) & (ls > 0), ls, 1.0)
    var_y = np.where(np.isfinite(var_y) & (var_y > 0), var_y, 1.0)
    return {
        "lengthscales": ls.astype(batch.X.dtype),
        "kernel_variance": var_y.astype(batch.X.dtype),
        "likelihood_variance": (0.1 * var_y).astype(batch.X.dtype),
    }


def polish_tile_batch(
    batch: TileBatch,
    coarse_res: Dict[str, np.ndarray],
    core: Optional[ModelCore] = None,
    *,
    jitter: float = 0.0,
    max_iter: int = 25,
    tols: Optional[dict] = None,
    fixed_params: tuple = (),
    device=None,
    mesh: Optional[Mesh] = None,
    linesearch: str = "single_eval",
) -> Dict[str, np.ndarray]:
    """f64 polish of a coarse (f32/TPU) batch result.

    Re-optimizes every expert in float64 from the coarse optima with a
    short L-BFGS run and predicts in float64, by default on the CPU
    backend — the accuracy tail of the TPU-bulk / f64-tail split
    (BASELINE.md 1e-5 north star; measured by bench_accuracy.py).

    linesearch defaults to "single_eval" (one value+grad per iteration):
    measured 10x faster than "zoom" at slightly BETTER accuracy (22.9 s
    vs 228.6 s steady on B=16 N=512 CPU, dmean 8.6e-7 vs 1.05e-6) —
    warm-started zoom burns its budget on strong-Wolfe probes in the flat
    region around the optimum, and every probe bills all vmap lanes.

    coarse_res: a run_tile_batch result aligned with ``batch`` rows (its
    param entries are the warm starts).
    """
    import jax as _jax

    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.parallel.batching import cast_batch

    if core is None:
        core = make_gpr_core(jitter=jitter)
    batch64 = cast_batch(batch, np.float64)
    B = batch64.B
    init = {}
    for k in core.param_names:
        v = np.asarray(coarse_res[k], dtype=np.float64)
        assert v.shape[0] == B, (
            f"coarse_res['{k}'] has {v.shape[0]} rows, batch has {B} — polish "
            "needs a result aligned with the (unpadded) batch"
        )
        init[k] = v
    runner = make_batched_runner(
        core,
        fixed_params=tuple(dict.fromkeys(tuple(fixed_params) + tuple(core.default_fixed_params))),
        max_iter=max_iter, linesearch=linesearch,
        **(tols or dict(tol_grad=1e-6, tol_f=1e-11)), mesh=mesh,
    )
    dev = device if device is not None else _jax.devices("cpu")[0]
    # the whole point is float64: production TPU processes run with x64
    # disabled, where jnp.asarray would silently truncate the f64 arrays
    # back to f32 — enable x64 for the scope of the polish
    x64_was = bool(_jax.config.read("jax_enable_x64"))
    try:
        if not x64_was:
            _jax.config.update("jax_enable_x64", True)
        with _jax.default_device(dev):
            return run_tile_batch(batch64, init, runner, core, mesh=mesh)
    finally:
        if not x64_was:
            _jax.config.update("jax_enable_x64", False)


def run_tile_batch_async(
    batch: TileBatch,
    init_cparams: Dict[str, np.ndarray],
    runner: Callable,
    core: ModelCore,
    *,
    mesh: Optional[Mesh] = None,
    pad_multiple: Optional[int] = None,
    keep_state: bool = False,
) -> Callable[[], Dict[str, np.ndarray]]:
    """Dispatch one shape bucket WITHOUT blocking; returns finalize().

    JAX dispatch is asynchronous: the returned closure forces results to
    host (stripping dead-tile padding) when called, so a caller can store
    the previous bucket's results while the device runs this one
    (the orchestrator's host/device overlap).

    init_cparams: constrained params, each either unbatched (applied to all
    experts) or with a leading [B] axis (per-expert warm starts).
    """
    init_cparams = dict(init_cparams)
    if init_cparams.pop("smart_init", False):
        init_cparams = {**_smart_init(batch), **init_cparams}
    if core.prepare_batch_init is not None:
        init_cparams = core.prepare_batch_init(batch, init_cparams)

    B = batch.B
    # pad the expert axis to a power of two (and a mesh multiple) so
    # different-sized buckets share one compiled program per (Nmax, Pmax).
    # pad_multiple=<k> pads to the next multiple of k instead: fewer dead
    # lanes (every dead lane costs full compute in the vmap lockstep, e.g.
    # 1664 -> 2048 pow2 wastes 19%) at the price of less shape reuse —
    # right for a recurring fixed-size workload, wrong for exploratory runs.
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if pad_multiple:
        step = int(np.lcm(int(pad_multiple), max(n_dev, 1)))
        B_pad = int(-(-B // step) * step)
    else:
        B_pad = max(n_dev, 1)
        while B_pad < B:
            B_pad *= 2
        B_pad = int(-(-B_pad // n_dev) * n_dev)
    batch = pad_batch_to(batch, B_pad)

    D = batch.X.shape[-1]
    dtype = batch.X.dtype

    defaults = core.init_cparams(D, dtype=dtype)
    cparams0 = {}
    for k, dflt in defaults.items():
        v = np.asarray(init_cparams.get(k, dflt), dtype=dtype)
        pshape = np.shape(dflt)
        if v.ndim == len(pshape) + 1 and v.shape[0] == B:
            # per-expert values for the unpadded batch: pad with defaults
            if batch.B != B:
                v = np.concatenate([v, np.broadcast_to(dflt, (batch.B - B,) + pshape)], axis=0)
        else:
            v = np.broadcast_to(v, (batch.B,) + pshape).copy()
        cparams0[k] = v
    uparams0 = {k: np.asarray(v) for k, v in core.inverse(cparams0).items()}

    out = runner(
        jnp.asarray(batch.X),
        jnp.asarray(batch.y),
        jnp.asarray(batch.mask),
        jnp.asarray(batch.Xnew),
        {k: jnp.asarray(v) for k, v in uparams0.items()},
    )
    # out holds un-forced device arrays (JAX async dispatch): the device is
    # already crunching. finalize() blocks, fetches, and strips padding.

    def finalize():
        host = jax.tree_util.tree_map(np.asarray, out)
        live = batch.expert_index >= 0
        res = {
            "expert_index": batch.expert_index[live],
            "num_obs": batch.num_obs[live],
            "objective": host["objective"][live],
            "converged": host["converged"][live],
            "num_iter": host["num_iter"][live],
            "stalled": host["stalled"][live],
            "failed": host["failed"][live] if "failed" in host else np.zeros(int(live.sum()), dtype=bool),
            "f_mean": host["pred"]["f_mean"][live],
            "f_var": host["pred"]["f_var"][live],
            "y_var": host["pred"]["y_var"][live],
            "pred_mask": batch.pred_mask[live],
            "obs_mean": batch.obs_mean[live],
        }
        for k in core.param_names:
            res[k] = host["params"][k][live]
        if keep_state:
            state = jax.tree_util.tree_map(lambda a: a[live], host.get("opt_state"))
            u0_live = {k: np.asarray(v)[live] for k, v in uparams0.items()}
            return res, state, u0_live
        return res

    return finalize


def run_tile_batch(
    batch: TileBatch,
    init_cparams: Dict[str, np.ndarray],
    runner: Callable,
    core: ModelCore,
    *,
    mesh: Optional[Mesh] = None,
    pad_multiple: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Execute one shape bucket; returns host-side arrays [B, ...]."""
    return run_tile_batch_async(
        batch, init_cparams, runner, core, mesh=mesh, pad_multiple=pad_multiple
    )()


def run_tile_batch_carry(
    batch: TileBatch,
    init_cparams: Dict[str, np.ndarray],
    runner_head: Callable,
    runner_tail: Callable,
    core: ModelCore,
    *,
    mesh: Optional[Mesh] = None,
    pad_multiple: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """State-carrying unconverged-lane compaction (single_eval only).

    Like run_tile_batch_two_stage, but the head returns the full L-BFGS
    carry (iterate, gradient, curvature history, step) and the compacted
    tail RESUMES it — no history restart, so total iterations equal the
    single-run count exactly while the tail bills only the unconverged
    width.

    runner_head: make_batched_runner(core, max_iter=K1, return_state=True, ...)
    runner_tail: make_batched_runner(core, max_iter=rest, take_state=True,
                 return_state=True, ...)
    """
    # result rows must align positionally with batch rows, so strip any
    # pre-padded dead tiles (e.g. from the coalesce-buckets assembler)
    # up front; padding happens internally
    live_in = np.flatnonzero(np.asarray(batch.expert_index) >= 0)
    if len(live_in) != batch.B:
        from gpsat_tpu.parallel.batching import take_batch as _take

        batch = _take(batch, live_in)
    fin = run_tile_batch_async(
        batch, init_cparams, runner_head, core, mesh=mesh, pad_multiple=pad_multiple,
        keep_state=True,
    )
    res1, state1, uparams0 = fin()
    unconv = np.flatnonzero(~np.asarray(res1["converged"]))
    if len(unconv) == 0:
        res1.pop("opt_state", None)
        return res1

    from gpsat_tpu.parallel.batching import take_batch

    sub_batch = take_batch(batch, unconv)
    sub_u0 = {k: np.asarray(v)[unconv] for k, v in uparams0.items()}
    sub_state = jax.tree_util.tree_map(lambda a: np.asarray(a)[unconv], state1)
    # pad the sub-batch the same way run_tile_batch does, padding state and
    # uparams alongside (dead-lane state: done=True so they exit instantly)
    B_sub = len(unconv)
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if pad_multiple:
        step = int(np.lcm(int(pad_multiple), max(n_dev, 1)))
        B_pad = int(-(-B_sub // step) * step)
    else:
        B_pad = max(n_dev, 1)
        while B_pad < B_sub:
            B_pad *= 2
        B_pad = int(-(-B_pad // n_dev) * n_dev)
    pad = B_pad - B_sub
    sub_batch = pad_batch_to(sub_batch, B_pad)

    def pad_rows(a, fill=0.0):
        a = np.asarray(a)
        if pad == 0:
            return a
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, dtype=a.dtype)], axis=0)

    sub_u0 = {k: pad_rows(v) for k, v in sub_u0.items()}
    sub_state = {
        k: pad_rows(v, fill=(True if k in ("done",) else 0))
        for k, v in sub_state.items()
    }
    sub_state["done"] = sub_state["done"].astype(bool)
    sub_state["failed"] = sub_state["failed"].astype(bool)
    if "stalled" in sub_state:
        sub_state["stalled"] = sub_state["stalled"].astype(bool)

    out2 = runner_tail(
        jnp.asarray(sub_batch.X),
        jnp.asarray(sub_batch.y),
        jnp.asarray(sub_batch.mask),
        jnp.asarray(sub_batch.Xnew),
        {k: jnp.asarray(v) for k, v in sub_u0.items()},
        {k: jnp.asarray(v) for k, v in sub_state.items()},
    )
    out2 = jax.tree_util.tree_map(np.asarray, out2)
    live = sub_batch.expert_index >= 0

    out = {k: np.asarray(v).copy() for k, v in res1.items() if k != "opt_state"}
    head_iters = out["num_iter"][unconv]
    out["objective"][unconv] = out2["objective"][live]
    out["converged"][unconv] = out2["converged"][live]
    out["stalled"][unconv] = out2["stalled"][live]
    if "failed" in out and "failed" in out2:
        out["failed"][unconv] = out2["failed"][live]
    out["num_iter"][unconv] = head_iters + out2["num_iter"][live]
    out["f_mean"][unconv] = out2["pred"]["f_mean"][live]
    out["f_var"][unconv] = out2["pred"]["f_var"][live]
    out["y_var"][unconv] = out2["pred"]["y_var"][live]
    for k in core.param_names:
        out[k][unconv] = out2["params"][k][live]
    return out


def run_tile_batch_two_stage(
    batch: TileBatch,
    init_cparams: Dict[str, np.ndarray],
    runner_head: Callable,
    runner_tail: Callable,
    core: ModelCore,
    *,
    mesh: Optional[Mesh] = None,
    pad_multiple: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Unconverged-lane compaction: under vmap every iteration costs the
    FULL batch even after most lanes have converged, so the slowest lane
    sets the bill. Run the whole batch for runner_head's iteration budget,
    then gather only the unconverged lanes into a (padded, much smaller)
    batch and finish them with runner_tail — the long tail pays a fraction
    of the width. Optima are unchanged (warm restart from the stage-1
    iterate; L-BFGS history rebuilds in a couple of iterations).

    runner_head: make_batched_runner(core, max_iter=K1, ...)
    runner_tail: make_batched_runner(core, max_iter=<rest>, ...)
    """
    from gpsat_tpu.parallel.batching import take_batch

    res1 = run_tile_batch(
        batch, init_cparams, runner_head, core, mesh=mesh, pad_multiple=pad_multiple
    )
    # rows align with the (unpadded) batch rows in order
    unconv = np.flatnonzero(~np.asarray(res1["converged"]))
    if len(unconv) == 0:
        return res1

    sub_batch = take_batch(batch, unconv)
    sub_init = {k: np.asarray(res1[k])[unconv] for k in core.param_names}
    res2 = run_tile_batch(
        sub_batch, sub_init, runner_tail, core, mesh=mesh, pad_multiple=pad_multiple
    )

    out = {k: np.asarray(v).copy() for k, v in res1.items()}
    head_iters = out["num_iter"][unconv]
    for k, v in res2.items():
        out[k][unconv] = v
    out["num_iter"][unconv] = head_iters + res2["num_iter"]
    return out
