"""Model-zoo throughput bench: experts/s for each batched core on TPU.

VERDICT r1 gap: only exact GPR had a measured TPU number. This script
benches every core routed through the batched engine — GPR, SGPR, SVGP
(Adam runner), VFF, ASVGP — at canonical tile shapes, printing one JSON
line per model:

  {"model": ..., "experts_per_sec": ..., "B": ..., "N": ..., "P": ...,
   "converged": ..., "iters_mean": ..., "first_call_s": ..., "steady_s": ...}

Usage: python bench_models.py [--cpu] [-B 128] [-N 512] [--models gpr,sgpr,...]
Results are recorded in docs/architecture.md.
"""

import argparse
import json
import time

import numpy as np


def make_batch(B, N, P, D, dtype, seed=0):
    from gpsat_tpu.parallel.batching import TileBatch

    rng = np.random.default_rng(seed)
    X = rng.uniform(-6, 6, size=(B, N, D)).astype(dtype)
    y = (np.sin(X[..., 0]) * np.cos(X[..., 1]) + 0.1 * rng.normal(size=(B, N))).astype(dtype)
    mask = np.ones((B, N), dtype=dtype)
    fill = rng.integers(int(0.6 * N), N + 1, size=B)
    for i, f in enumerate(fill):
        mask[i, f:] = 0.0
    Xnew = rng.uniform(-4, 4, size=(B, P, D)).astype(dtype)
    return TileBatch(
        X=X, y=y, mask=mask, Xnew=Xnew,
        pred_mask=np.ones((B, P), dtype=dtype),
        obs_mean=np.zeros(B, dtype=dtype),
        expert_index=np.arange(B),
        num_obs=fill,
    )


def build(model, on_tpu):
    """(core, runner_kwargs, init, extra_note) per model at canonical shapes."""
    jitter = 1e-5 if on_tpu else 1e-8
    if model == "gpr":
        from gpsat_tpu.models.functional import make_gpr_core

        return make_gpr_core(jitter=jitter), {}, {"smart_init": True}, ""
    if model == "sgpr":
        from gpsat_tpu.models.sgpr import make_sgpr_core

        M = 128
        return make_sgpr_core(jitter=jitter, num_inducing_points=M), {}, {"smart_init": True}, f"M={M}"
    if model == "svgp":
        from gpsat_tpu.models.svgp import make_svgp_core

        M = 64
        # default solver='auto': collapsed L-BFGS for the Gaussian
        # likelihood (exact optimum; ~30 iters vs ~2k adam steps)
        core = make_svgp_core(jitter=jitter, num_inducing_points=M)
        return core, {}, {"smart_init": True}, f"M={M}, collapsed"
    if model == "svgp_adam":
        from gpsat_tpu.models.svgp import make_svgp_core

        M = 64
        core = make_svgp_core(jitter=jitter, num_inducing_points=M, solver="adam", q_init=None)
        return core, dict(max_iter=2000, learning_rate=1e-2, check_every=10, persistence=100), {}, f"M={M}, adam (reference parity)"
    if model == "svgp_natgrad":
        from gpsat_tpu.models.svgp import make_svgp_core

        M = 64
        core = make_svgp_core(jitter=jitter, num_inducing_points=M, natural_gradients=True, gamma=0.5)
        return core, dict(max_iter=2000, learning_rate=1e-2, check_every=10, persistence=100), {}, f"M={M}, adam+natgrad g=0.5"
    if model == "svgp_bernoulli":
        from gpsat_tpu.models.svgp import make_svgp_core

        M = 64
        # non-Gaussian auto default: joint L-BFGS over hypers + whitened q
        core = make_svgp_core(jitter=jitter, num_inducing_points=M, likelihood="Bernoulli")
        return core, dict(max_iter=1000), {"smart_init": True}, f"M={M}, joint lbfgs"
    if model == "svgp_bernoulli_adam":
        from gpsat_tpu.models.svgp import make_svgp_core

        M = 64
        core = make_svgp_core(
            jitter=jitter, num_inducing_points=M, likelihood="Bernoulli",
            solver="adam", q_init=None,
        )
        return core, dict(max_iter=2000, learning_rate=1e-2, check_every=10, persistence=100), {}, f"M={M}, adam (reference parity)"
    if model == "vff":
        from gpsat_tpu.models.vff import make_vff_core

        M = 10
        return make_vff_core(num_inducing_features=M), {}, {"smart_init": True}, f"M={M}/dim"
    if model == "asvgp":
        from gpsat_tpu.models.asvgp import make_asvgp_core

        M = 20
        return make_asvgp_core(num_inducing_features=M), {}, {"smart_init": True}, f"M={M}/dim"
    raise ValueError(model)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-B", type=int, default=128)
    ap.add_argument("-N", type=int, default=512)
    ap.add_argument("-P", type=int, default=64)
    ap.add_argument("--models", default="gpr,sgpr,svgp,vff,asvgp")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from gpsat_tpu import enable_compilation_cache

    enable_compilation_cache()

    from gpsat_tpu.parallel.engine import (
        make_batched_adam_runner,
        make_batched_runner,
        run_tile_batch,
    )

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = np.float32 if on_tpu else np.float64
    B, N, P, D = args.B, args.N, args.P, 2
    batch = make_batch(B, N, P, D, dtype)

    for model in args.models.split(","):
        core, rk, init, note = build(model, on_tpu)
        if core.optimizer == "adam":
            runner = make_batched_adam_runner(
                core, fixed_params=tuple(core.default_fixed_params), **rk
            )
        else:
            tols = dict(tol_grad=1e-3, tol_f=1e-6) if on_tpu else dict(tol_grad=1e-6, tol_f=1e-11)
            runner = make_batched_runner(
                core, fixed_params=tuple(core.default_fixed_params),
                max_iter=rk.pop("max_iter", 150), **tols, **rk,
            )
        t0 = time.perf_counter()
        res = run_tile_batch(batch, dict(init), runner, core)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = run_tile_batch(batch, dict(init), runner, core)
        steady = time.perf_counter() - t0
        print(json.dumps({
            "model": model,
            "experts_per_sec": round(B / steady, 1),
            "B": B, "N": N, "P": P,
            "converged": f"{int(np.asarray(res['converged']).sum())}/{B}",
            "stall_exits": int(np.asarray(res.get("stalled", 0)).sum()),
            "failed_exits": int(np.asarray(res.get("failed", 0)).sum()),
            "iters_mean": round(float(np.asarray(res["num_iter"]).mean()), 1),
            # the vmapped while_loop bills every lane until the slowest
            # converges, so iters_max is what the batch actually pays
            "iters_max": int(np.asarray(res["num_iter"]).max()),
            "first_call_s": round(first, 1),
            "steady_s": round(steady, 2),
            "note": note,
        }), flush=True)


if __name__ == "__main__":
    main()
