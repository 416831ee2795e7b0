"""Accuracy harness: f32 TPU production path vs f64 reference-parity path.

BASELINE.md's north star is "prediction mean/var within 1e-5 of the GPflow
reference". The f64 CPU path meets the 1e-6 sklearn-oracle tolerance
(tests/test_gpr_oracle.py, mirroring /root/reference/tests/
test_localexperts.py:204-227); this script quantifies the f32 TPU
production path against that f64 gold standard on identical tiles, and
measures how far an optional f64 polish (warm-started f64 re-optimization +
f64 prediction on the CPU backend, engine option polish='f64') closes the
gap.

Runs three passes over the same B x N tiles:
  gold    f64, CPU backend, zoom linesearch, jitter 0   (reference parity)
  f32     f32, default backend (TPU when attached), single_eval, jitter 1e-5
  polish  f32 pass's optima -> few f64 zoom iterations + f64 predict (CPU)

Prints one JSON line per comparison:
  {"path": ..., "max_abs_dmean": ..., "max_abs_dvar": ...,
   "rms_dmean": ..., "max_rel_dparam": ..., "iters": ...}

Usage: python bench_accuracy.py [--cpu] [-B 32] [-N 512]
"""

import argparse
import json
import time

import numpy as np


def make_batch(B, N, P, D, dtype):
    from gpsat_tpu.parallel.batching import TileBatch

    rng = np.random.default_rng(0)
    X = rng.uniform(-6, 6, size=(B, N, D)).astype(dtype)
    y = (np.sin(X[..., 0]) * np.cos(X[..., 1]) + 0.1 * rng.normal(size=(B, N))).astype(dtype)
    mask = np.ones((B, N), dtype=dtype)
    fill = rng.integers(int(0.6 * N), N + 1, size=B)
    for i, f in enumerate(fill):
        mask[i, f:] = 0.0
    Xnew = rng.uniform(-4, 4, size=(B, P, D)).astype(dtype)
    batch = TileBatch(
        X=X, y=y, mask=mask, Xnew=Xnew,
        pred_mask=np.ones((B, P), dtype=dtype),
        obs_mean=np.zeros(B, dtype=dtype),
        expert_index=np.arange(B),
        num_obs=fill,
    )
    init = {
        "lengthscales": np.nanstd(np.where(mask[..., None] > 0, X, np.nan), axis=1).astype(dtype),
        "kernel_variance": np.nanvar(np.where(mask > 0, y, np.nan), axis=1).astype(dtype),
        "likelihood_variance": 0.1 * np.nanvar(np.where(mask > 0, y, np.nan), axis=1).astype(dtype),
    }
    return batch, init


def run(batch, init, *, jitter, linesearch, tols, max_iter=200, device=None):
    import jax

    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

    core = make_gpr_core(jitter=jitter)
    runner = make_batched_runner(core, max_iter=max_iter, linesearch=linesearch, **tols)
    ctx = jax.default_device(device) if device is not None else _null_ctx()
    with ctx:
        t0 = time.perf_counter()
        res = run_tile_batch(batch, init, runner, core)
        elapsed = time.perf_counter() - t0
    return res, elapsed


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def compare(name, res, gold, t, extra=""):
    dmean = np.abs(np.asarray(res["f_mean"], np.float64) - np.asarray(gold["f_mean"], np.float64))
    dvar = np.abs(np.asarray(res["f_var"], np.float64) - np.asarray(gold["f_var"], np.float64))
    rels = []
    for k in ("lengthscales", "kernel_variance", "likelihood_variance"):
        a = np.asarray(res[k], np.float64)
        b = np.asarray(gold[k], np.float64)
        rels.append(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-12)))
    out = {
        "path": name,
        "max_abs_dmean": float(dmean.max()),
        "rms_dmean": float(np.sqrt((dmean**2).mean())),
        "max_abs_dvar": float(dvar.max()),
        "max_rel_dparam": float(max(rels)),
        "converged": f"{int(np.asarray(res['converged']).sum())}/{len(np.asarray(res['converged']))}",
        "iters_mean": round(float(np.asarray(res["num_iter"]).mean()), 1),
        "seconds": round(t, 1),
    }
    if extra:
        out["note"] = extra
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU for the f32 pass (no TPU)")
    ap.add_argument("-B", type=int, default=32)
    ap.add_argument("-N", type=int, default=512)
    ap.add_argument("-P", type=int, default=64)
    ap.add_argument("--polish-iters", type=int, default=100)
    ap.add_argument("--gold-steady", action="store_true",
                    help="also time a second (warm-compile) gold pass")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from gpsat_tpu import enable_compilation_cache

    enable_compilation_cache()

    cpu0 = jax.devices("cpu")[0]
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    f32_dev = accel[0] if accel else cpu0
    print(f"# f64 gold on {cpu0}, f32 production pass on {f32_dev}")

    from gpsat_tpu.parallel.batching import cast_batch

    B, N, P, D = args.B, args.N, args.P, 2
    batch64, init64 = make_batch(B, N, P, D, np.float64)
    batch32 = cast_batch(batch64, np.float32)
    init32 = {k: v.astype(np.float32) for k, v in init64.items()}

    f64_tols = dict(tol_grad=1e-6, tol_f=1e-11)
    f32_tols = dict(tol_grad=1e-3, tol_f=1e-6)

    gold, t = run(batch64, init64, jitter=0.0, linesearch="zoom", tols=f64_tols, device=cpu0)
    row = {"path": "gold_f64_cpu", "seconds": round(t, 1),
           "converged": f"{int(np.asarray(gold['converged']).sum())}/{B}"}
    if args.gold_steady:
        _, t_steady = run(batch64, init64, jitter=0.0, linesearch="zoom", tols=f64_tols, device=cpu0)
        row["steady_seconds"] = round(t_steady, 1)
    print(json.dumps(row))

    res32, t32 = run(batch32, init32, jitter=1e-5, linesearch="single_eval",
                     tols=f32_tols, device=f32_dev)
    _, t32_steady = run(batch32, init32, jitter=1e-5, linesearch="single_eval",
                        tols=f32_tols, device=f32_dev)
    compare("f32_production", res32, gold, t32, extra=f"steady-state {t32_steady:.1f}s")

    # f64 predict-only: keep the f32 optima, redo just the prediction pass
    # in f64 on CPU (polish with a zero-iteration budget) — isolates how
    # much of the f32 gap is predict arithmetic vs hyperparameter error
    from gpsat_tpu.parallel.engine import polish_tile_batch

    t0 = time.perf_counter()
    resq = polish_tile_batch(batch64, res32, jitter=0.0, max_iter=0, tols=f64_tols, device=cpu0)
    tq = time.perf_counter() - t0
    t0 = time.perf_counter()
    resq = polish_tile_batch(batch64, res32, jitter=0.0, max_iter=0, tols=f64_tols, device=cpu0)
    tq2 = time.perf_counter() - t0
    compare("f64_predict_only", resq, gold, tq,
            extra=f"f32 hypers + f64 predict; steady-state {tq2:.1f}s")

    # f64 polish: warm-start a short f64 zoom run from the f32 optima on the
    # CPU backend, then f64 predict — the engine's polish path. Run twice:
    # the first call pays compile, the second is the steady-state cost that
    # matters at pipeline scale (VERDICT r2 weak #2).
    t0 = time.perf_counter()
    resp = polish_tile_batch(
        batch64, res32, jitter=0.0, max_iter=args.polish_iters, tols=f64_tols, device=cpu0
    )
    tp = time.perf_counter() - t0
    t0 = time.perf_counter()
    resp = polish_tile_batch(
        batch64, res32, jitter=0.0, max_iter=args.polish_iters, tols=f64_tols, device=cpu0
    )
    tp2 = time.perf_counter() - t0
    compare("f32_plus_f64_polish", resp, gold, tp,
            extra=f"warm-started f64 zoom from f32 optima + f64 predict; steady-state {tp2:.1f}s")


if __name__ == "__main__":
    main()
