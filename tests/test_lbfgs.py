"""Batched L-BFGS driver: all linesearch modes reach the same optima.

The reference optimizes each expert with a scipy L-BFGS-B session
(GPSat/models/gpflow_models.py:317-321); here the optimizer runs inside the
XLA program, so its convergence behavior is tested directly: classic
Rosenbrock, plus mode-agreement on a real batched GPR marginal likelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpsat_tpu.optim.lbfgs import minimize_lbfgs

MODES = ["zoom", "backtracking", "single_eval"]


def _rosen(p):
    x = p["x"]
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


class TestLBFGS:
    @pytest.mark.parametrize("mode", MODES)
    def test_rosenbrock(self, mode):
        x0 = {"x": jnp.zeros(6)}
        res = jax.jit(lambda x0: minimize_lbfgs(_rosen, x0, max_iter=500, linesearch=mode))(x0)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.params["x"]), 1.0, atol=1e-5)

    @pytest.mark.parametrize("mode", MODES)
    def test_vmapped_rosenbrock_lanes_independent(self, mode):
        # lanes start at different points; all must reach the optimum even
        # though under vmap every lane executes every other lane's iterations
        x0 = {"x": jnp.stack([jnp.zeros(4), jnp.full(4, -1.5), jnp.full(4, 0.5)])}
        run = jax.jit(
            jax.vmap(lambda x0: minimize_lbfgs(_rosen, x0, max_iter=800, linesearch=mode))
        )
        res = run(x0)
        assert bool(res.converged.all())
        np.testing.assert_allclose(np.asarray(res.params["x"]), 1.0, atol=1e-4)

    def test_modes_agree_on_gpr(self):
        from gpsat_tpu.models.functional import make_gpr_core
        from gpsat_tpu.parallel.batching import TileBatch
        from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

        rng = np.random.default_rng(0)
        B, N, P, D = 3, 64, 8, 2
        X = rng.uniform(-2, 2, (B, N, D))
        y = np.sin(X[..., 0]) * np.cos(X[..., 1]) + 0.1 * rng.normal(size=(B, N))
        batch = TileBatch(
            X=X,
            y=y,
            mask=np.ones((B, N)),
            Xnew=rng.uniform(-2, 2, (B, P, D)),
            pred_mask=np.ones((B, P)),
            obs_mean=np.zeros(B),
            expert_index=np.arange(B),
            num_obs=np.full(B, N),
        )
        core = make_gpr_core("Matern32")
        outs = {}
        for mode in MODES:
            runner = make_batched_runner(core, max_iter=300, linesearch=mode)
            out = run_tile_batch(batch, {"smart_init": True}, runner, core)
            assert out["converged"].all(), mode
            outs[mode] = out
        for mode in MODES[1:]:
            np.testing.assert_allclose(
                outs[mode]["objective"], outs["zoom"]["objective"], rtol=1e-7
            )
            np.testing.assert_allclose(outs[mode]["f_mean"], outs["zoom"]["f_mean"], atol=1e-5)
            np.testing.assert_allclose(
                outs[mode]["lengthscales"], outs["zoom"]["lengthscales"], rtol=1e-3
            )


class TestNoFalseConvergence:
    def test_probe_capped_backtracking_is_honest(self):
        # A single backtracking probe at a steep quadratic overshoots and is
        # rejected -> the iterate does not move -> delta-f == 0. That must
        # NOT register as the factr convergence test (it used to): either
        # the run genuinely reaches the optimum, or converged is False.
        steep = lambda p: 1e6 * jnp.sum(p["x"] ** 2)  # noqa: E731
        x0 = {"x": jnp.ones(3)}
        res = jax.jit(
            lambda x0: minimize_lbfgs(
                steep, x0, max_iter=50, linesearch="backtracking", max_linesearch_steps=1
            )
        )(x0)
        if bool(res.converged):
            assert float(res.final_value) < 1e-3, (
                "reported converged=True while stuck at f="
                f"{float(res.final_value)} (false convergence)"
            )

    def test_stalled_lane_exits_early(self):
        # the stall guard must terminate a no-progress loop well before
        # max_iter instead of burning the full budget
        steep = lambda p: 1e6 * jnp.sum(p["x"] ** 2)  # noqa: E731
        x0 = {"x": jnp.ones(3)}
        res = jax.jit(
            lambda x0: minimize_lbfgs(
                steep, x0, max_iter=10_000, linesearch="backtracking", max_linesearch_steps=1
            )
        )(x0)
        converged_properly = bool(res.converged) and float(res.final_value) < 1e-3
        assert converged_properly or int(res.num_iter) < 10_000


class TestDtypeAwareLinesearchDefault:
    def test_f32_defaults_to_single_eval_f64_to_zoom(self, monkeypatch):
        from gpsat_tpu.models.functional import make_gpr_core
        from gpsat_tpu.parallel import engine
        from gpsat_tpu.parallel.batching import TileBatch
        from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

        seen = []
        orig = engine.minimize_lbfgs

        def spy(fun, x0, **kw):
            seen.append(kw.get("linesearch"))
            return orig(fun, x0, **kw)

        monkeypatch.setattr(engine, "minimize_lbfgs", spy)

        rng = np.random.default_rng(0)
        B, N, P, D = 2, 32, 4, 2
        core = make_gpr_core(jitter=1e-5)
        for dt, expect in [(np.float32, "single_eval"), (np.float64, "zoom")]:
            X = rng.uniform(-2, 2, (B, N, D)).astype(dt)
            y = (np.sin(X[..., 0]) + 0.1 * rng.normal(size=(B, N))).astype(dt)
            batch = TileBatch(
                X=X,
                y=y,
                mask=np.ones((B, N), dtype=dt),
                Xnew=rng.uniform(-2, 2, (B, P, D)).astype(dt),
                pred_mask=np.ones((B, P), dtype=dt),
                obs_mean=np.zeros(B, dtype=dt),
                expert_index=np.arange(B),
                num_obs=np.full(B, N),
            )
            seen.clear()
            runner = make_batched_runner(core, max_iter=2)
            run_tile_batch(batch, {"likelihood_variance": 0.1}, runner, core)
            assert seen == [expect], f"dtype {dt}: expected {expect}, traced {seen}"


def test_unresolvable_decrease_converges_not_fails():
    """A lane whose objective cannot be resolved further at a small step
    (rejected tie within the factr tolerance) must exit CONVERGED — not
    spiral to step<1e-12 and report failed. (f32 tie-rejection mode;
    regression for the carry-compaction investigation.)"""
    # value resolution coarser than gradient resolution — exactly the f32
    # tie mode: values quantized (ties possible), gradients smooth (the
    # optimizer keeps proposing moves)
    @jax.custom_jvp
    def qval(f):
        return jnp.round(f * 1e3) / 1e3

    @qval.defjvp
    def _qval_jvp(primals, tangents):
        (f,), (df,) = primals, tangents
        return qval(f), df  # smooth gradient through the quantization

    quantized = lambda p: qval(jnp.sum(p["x"] ** 2))  # noqa: E731

    x0 = {"x": jnp.full(2, 0.3)}
    res = jax.jit(
        lambda x0: minimize_lbfgs(
            quantized, x0, max_iter=300, linesearch="single_eval",
            tol_grad=1e-12, tol_f=1e-6,
        )
    )(x0)
    assert bool(res.converged), (
        f"tie-rejection should converge; failed={bool(res.failed)}, "
        f"iters={int(res.num_iter)}, f={float(res.final_value)}"
    )
    assert float(res.final_value) < 1e-2  # made real progress first
