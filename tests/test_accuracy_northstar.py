"""North-star accuracy regression guard (VERDICT r3 item 4).

BASELINE.md: production predictions must land within 1e-5 of the f64
reference-parity path. bench_accuracy.py measures this at scale on TPU;
this test pins the same contract in CI on a small batch so a regression
in the f32 path or the f64 polish tail fails fast (tolerance contract
mirrors /root/reference/tests/test_localexperts.py:204-251).

Pipeline under test: f32 single_eval optimize (the TPU production
configuration, here on CPU) -> engine polish_tile_batch with its SHIPPED
defaults (single_eval f64 warm-start + f64 predict) -> compare to a
f64/zoom/jitter-0 gold run on identical tiles.
"""

import numpy as np


def _make_batch(B, N, P, D, dtype):
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


def test_f32_plus_polish_meets_1e5_north_star():
    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.parallel.batching import cast_batch
    from gpsat_tpu.parallel.engine import (
        make_batched_runner,
        polish_tile_batch,
        run_tile_batch,
    )

    B, N, P, D = 8, 128, 32, 2
    batch64, init64 = _make_batch(B, N, P, D, np.float64)
    batch32 = cast_batch(batch64, np.float32)
    init32 = {k: v.astype(np.float32) for k, v in init64.items()}

    # f64 gold: reference-parity configuration
    gold_core = make_gpr_core(jitter=0.0)
    gold_runner = make_batched_runner(
        gold_core, max_iter=200, linesearch="zoom", tol_grad=1e-6, tol_f=1e-11
    )
    gold = run_tile_batch(batch64, init64, gold_runner, gold_core)
    assert np.asarray(gold["converged"]).all()

    # f32 production configuration (single_eval, jitter 1e-5)
    f32_core = make_gpr_core(jitter=1e-5)
    f32_runner = make_batched_runner(
        f32_core, max_iter=200, linesearch="single_eval", tol_grad=1e-3, tol_f=1e-6
    )
    res32 = run_tile_batch(batch32, init32, f32_runner, f32_core)
    assert np.asarray(res32["converged"]).all()

    # shipped polish defaults (single_eval), except a raised iter budget so
    # the test pins accuracy, not the default 25-iteration cost point
    polished = polish_tile_batch(batch64, res32, jitter=0.0, max_iter=100)

    dmean = np.max(np.abs(np.asarray(polished["f_mean"], np.float64) - np.asarray(gold["f_mean"], np.float64)))
    dvar = np.max(np.abs(np.asarray(polished["f_var"], np.float64) - np.asarray(gold["f_var"], np.float64)))
    assert dmean <= 1e-5, f"polished f_mean off gold by {dmean:.2e} (> 1e-5 north star)"
    assert dvar <= 1e-5, f"polished f_var off gold by {dvar:.2e} (> 1e-5 north star)"

    # the raw f32 pass must itself stay within production expectations
    # (~1e-3-level; guards against silent catastrophic conditioning loss)
    draw = np.max(np.abs(np.asarray(res32["f_mean"], np.float64) - np.asarray(gold["f_mean"], np.float64)))
    assert draw <= 5e-2, f"raw f32 f_mean off gold by {draw:.2e}"


def test_sgpr_chunked_polish_meets_north_star():
    """The polish tier on the CHUNKED SGPR path (VERDICT r4 item 2).

    Small-scale CI twin of bench_large_n.py --polish-check: f32 coarse
    (production config, chunk-accumulated lax.scan factors) -> f64 polish
    (warm-start re-opt + f64 predict) vs an f64/zoom gold run. Guards the
    large-N accuracy tier at the reference's SGPR oracle tolerance
    (GPSat tests/test_localexperts.py:229-251 uses 1e-4; the polish is
    expected to land well under it)."""
    from gpsat_tpu.experts import bijectors_from
    from gpsat_tpu.models.sgpr import make_sgpr_core
    from gpsat_tpu.parallel.batching import cast_batch
    from gpsat_tpu.parallel.engine import (
        make_batched_runner,
        polish_tile_batch,
        run_tile_batch,
    )

    B, N, P, D, M, chunk = 2, 1024, 16, 2, 32, 256
    batch64, _ = _make_batch(B, N, P, D, np.float64)
    batch32 = cast_batch(batch64, np.float32)

    gold_core = make_sgpr_core(
        kernel="Matern32", bijectors=bijectors_from(None),
        num_inducing_points=M, chunk_size=chunk,
    )
    gold_runner = make_batched_runner(
        gold_core, fixed_params=("inducing_points",), max_iter=200,
        linesearch="zoom", tol_grad=1e-6, tol_f=1e-11,
    )
    gold = run_tile_batch(batch64, {"smart_init": True}, gold_runner, gold_core)

    core32 = make_sgpr_core(
        kernel="Matern32", bijectors=bijectors_from(None),
        num_inducing_points=M, chunk_size=chunk, jitter=1e-5,
    )
    r32 = make_batched_runner(
        core32, fixed_params=("inducing_points",), max_iter=200,
        linesearch="single_eval", tol_grad=1e-3, tol_f=1e-6,
    )
    res32 = run_tile_batch(batch32, {"smart_init": True}, r32, core32)

    polished = polish_tile_batch(batch64, res32, core=gold_core, max_iter=100)

    dmean = np.max(np.abs(np.asarray(polished["f_mean"]) - np.asarray(gold["f_mean"])))
    dvar = np.max(np.abs(np.asarray(polished["f_var"]) - np.asarray(gold["f_var"])))
    assert dmean <= 1e-5, f"SGPR polished f_mean off gold by {dmean:.2e}"
    assert dvar <= 1e-5, f"SGPR polished f_var off gold by {dvar:.2e}"
