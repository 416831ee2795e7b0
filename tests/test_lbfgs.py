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
