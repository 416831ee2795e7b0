"""Benchmark: local-expert OI throughput on one TPU chip.

Workload modeled on the reference's canonical geometry (BASELINE.md):
B experts, N=512-point padded tiles (2-d EASE2-like coords scaled to O(1)
units), Matern32 exact GPR — batched L-BFGS on the masked log marginal
likelihood + posterior prediction at P=64 points per expert, all as one
jitted vmapped XLA program.

Metric: experts optimized+predicted per second (steady state, after
compile). vs_baseline compares against the reference's serial execution
measured at ~1 expert/s on CPU (SURVEY.md §6: "seconds-per-expert on CPU"
for scipy L-BFGS + GPflow on N≈100-600 tiles; no published numbers exist,
BASELINE.json published:{}).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_EXPERTS_PER_SEC = 1.0  # serial reference, CPU (SURVEY.md §6)


def main(B: int = None):
    import os

    import jax

    # GP linear algebra needs true-f32 matmuls; the TPU default (bf16 MXU
    # passes) breaks Cholesky conditioning and L-BFGS convergence
    jax.config.update("jax_default_matmul_precision", "highest")

    # persistent compile cache: the batch program compiles in minutes cold;
    # repeat runs (and the driver's round-over-round bench) skip it
    from gpsat_tpu import enable_compilation_cache

    enable_compilation_cache()

    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.parallel.batching import TileBatch
    from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = np.float32 if on_tpu else np.float64

    # B=512 measured optimal on v5e: the batched Cholesky is sequential-
    # latency-bound, so widening the batch axis is nearly free until the
    # MXU saturates (93/101/122/121 experts/s at B=128/256/512/1024,
    # identical per-lane iteration counts; see docs/architecture.md)
    B = int(os.environ.get("GPSAT_BENCH_B", 512)) if B is None else B
    N, P, D = 512, 64, 2
    rng = np.random.default_rng(0)
    # EASE2-like tile: +-300 km training radius scaled by 50 km
    X = rng.uniform(-6, 6, size=(B, N, D)).astype(dtype)
    y = (np.sin(X[..., 0]) * np.cos(X[..., 1]) + 0.1 * rng.normal(size=(B, N))).astype(dtype)
    mask = np.ones((B, N), dtype=dtype)
    # ragged tile sizes: 60-100% fill
    fill = rng.integers(int(0.6 * N), N + 1, size=B)
    for i, f in enumerate(fill):
        mask[i, f:] = 0.0
    Xnew = rng.uniform(-4, 4, size=(B, P, D)).astype(dtype)

    batch = TileBatch(
        X=X,
        y=y,
        mask=mask,
        Xnew=Xnew,
        pred_mask=np.ones((B, P), dtype=dtype),
        obs_mean=np.zeros(B, dtype=dtype),
        expert_index=np.arange(B),
        num_obs=fill,
    )

    # GPSAT_PROFILE=1: concentrated LML (kernel variance closed-form per
    # eval; one fewer search dimension, same per-iteration cost)
    core = make_gpr_core(
        jitter=1e-5 if on_tpu else 0.0,
        profile_variance=bool(int(os.environ.get("GPSAT_PROFILE", "0"))),
    )
    tols = dict(tol_grad=1e-3, tol_f=1e-6) if on_tpu else dict(tol_grad=1e-6, tol_f=1e-11)
    # single_eval: exactly one fused value+grad per L-BFGS iteration (no
    # linesearch probes at all — under vmap every probe is paid by all
    # lanes in lockstep); measured fastest at identical optima
    runner = make_batched_runner(core, max_iter=100, linesearch="single_eval", **tols)

    # data-driven init (fewer iterations for every lane): lengthscale from
    # coordinate spread, variances from the observed variance
    y_masked = np.where(mask > 0, y, np.nan)
    var_y = np.nanvar(y_masked, axis=1)
    init = {
        "lengthscales": np.stack([np.nanstd(np.where(mask[..., None] > 0, X, np.nan), axis=1)] , 0)[0],
        "kernel_variance": var_y,
        "likelihood_variance": 0.1 * var_y,
    }

    # compaction: run the full batch for K1 iterations, then gather only
    # the unconverged lanes (a much narrower batch) and finish them — the
    # slow tail stops billing the whole width. GPSAT_CARRY resumes the
    # L-BFGS state exactly (identical iterations/results to a single run);
    # GPSAT_TWO_STAGE is the legacy warm-restart variant.
    carry = int(os.environ.get("GPSAT_CARRY", "0"))
    two_stage = int(os.environ.get("GPSAT_TWO_STAGE", "0"))
    if carry:
        from gpsat_tpu.parallel.engine import run_tile_batch_carry

        head = make_batched_runner(core, max_iter=carry, linesearch="single_eval",
                                   return_state=True, **tols)
        tail = make_batched_runner(core, max_iter=100, linesearch="single_eval",
                                   take_state=True, return_state=True, **tols)
        execute = lambda: run_tile_batch_carry(batch, init, head, tail, core)  # noqa: E731
    elif two_stage:
        from gpsat_tpu.parallel.engine import run_tile_batch_two_stage

        head = make_batched_runner(core, max_iter=two_stage, linesearch="single_eval", **tols)
        execute = lambda: run_tile_batch_two_stage(batch, init, head, runner, core)  # noqa: E731
    else:
        execute = lambda: run_tile_batch(batch, init, runner, core)  # noqa: E731

    # warmup (compile)
    t0 = time.perf_counter()
    res = execute()
    compile_and_first = time.perf_counter() - t0

    # timed steady-state run
    t0 = time.perf_counter()
    res = execute()
    elapsed = time.perf_counter() - t0

    conv = int(res["converged"].sum())
    stall_exits = int(np.asarray(res.get("stalled", 0)).sum())
    failed_exits = int(np.asarray(res.get("failed", 0)).sum())
    it_mean = float(res["num_iter"].mean())
    it_max = int(res["num_iter"].max())
    eps = B / elapsed

    # roofline accounting (gpsat_tpu/utils/flops.py conventions): under
    # vmap lockstep every lane executes until the slowest lane in its
    # shard converges, so executed work uses it_max, useful work it_mean
    from gpsat_tpu.utils.flops import (
        V5E_F32_HIGHEST_TFLOPS,
        gpr_fused_iter_flops,
        gpr_predict_flops,
    )

    flops_exec = B * it_max * gpr_fused_iter_flops(N, D) + B * gpr_predict_flops(N, P, D)
    tflops = flops_exec / elapsed / 1e12
    out = {
        "metric": "experts_optimized_predicted_per_sec",
        "value": round(eps, 2),
        "unit": (
            f"experts/s (B={B}, N={N}, P={P}, converged {conv}/{B}, "
            f"iters mean/max {it_mean:.0f}/{it_max}, first-call {compile_and_first:.1f}s)"
        ),
        "vs_baseline": round(eps / REFERENCE_EXPERTS_PER_SEC, 2),
        "achieved_tflops": round(tflops, 2),
        "pct_of_f32_matmul_ceiling": round(100.0 * tflops / V5E_F32_HIGHEST_TFLOPS, 1),
        # tunnel-proof fields (VERDICT r4 item 7): steady_s is the timed
        # post-compile repeat; stall_exits counts lanes whose L-BFGS exit
        # was the flat-optimum stall guard rather than a tolerance
        "steady_s": round(elapsed, 3),
        "stall_exits": stall_exits,
        "failed_exits": failed_exits,
    }
    print(json.dumps(out))


def _main_with_backend_retry():
    """Re-exec on TPU-backend-unavailable (the axon tunnel flaps for long
    stretches — observed hours of UNAVAILABLE). Backend init failure is
    sticky within a process, so retrying means a fresh interpreter; bounded
    by GPSAT_BENCH_ATTEMPT so a hard-down TPU still fails eventually."""
    import os
    import sys
    import time

    try:
        main()
    except RuntimeError as e:
        if "Unable to initialize backend" not in str(e):
            raise
        attempt = int(os.environ.get("GPSAT_BENCH_ATTEMPT", "0"))
        max_tries = int(os.environ.get("GPSAT_BENCH_MAX_TRIES", "6"))
        if attempt + 1 >= max_tries:
            raise
        print(
            f"TPU backend unavailable (attempt {attempt + 1}/{max_tries}); "
            "retrying in 300s",
            file=sys.stderr, flush=True,
        )
        os.environ["GPSAT_BENCH_ATTEMPT"] = str(attempt + 1)
        time.sleep(300)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_backend_retry()
