"""Profiled (concentrated) LML: same optimum as the joint problem over one
fewer search dimension (make_gpr_core(profile_variance=True))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpsat_tpu.models.functional import make_gpr_core
from gpsat_tpu.parallel.batching import TileBatch
from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch


def _batch(B=8, N=64, P=4, D=2, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-6, 6, size=(B, N, D)).astype(dtype)
    y = (np.sin(X[..., 0]) * np.cos(X[..., 1]) + 0.1 * rng.normal(size=(B, N))).astype(dtype)
    mask = np.ones((B, N), dtype=dtype)
    fill = rng.integers(int(0.7 * N), N + 1, size=B)
    for i, f in enumerate(fill):
        mask[i, f:] = 0.0
    Xnew = rng.uniform(-4, 4, size=(B, P, D)).astype(dtype)
    batch = TileBatch(X=X, y=y, mask=mask, Xnew=Xnew,
                      pred_mask=np.ones((B, P), dtype=dtype),
                      obs_mean=np.zeros(B, dtype=dtype),
                      expert_index=np.arange(B), num_obs=fill)
    var_y = np.nanvar(np.where(mask > 0, y, np.nan), axis=1)
    init = {
        "lengthscales": np.nanstd(np.where(mask[..., None] > 0, X, np.nan), axis=1),
        "kernel_variance": var_y,
        "likelihood_variance": 0.1 * var_y,
    }
    return batch, init


class TestProfiledCore:
    def test_same_optimum_as_joint_f64(self):
        """On non-degenerate lanes the profiled optimum == the joint
        optimum. One lane of this seed (lane 3) collapses to the pure-noise
        stationary point — the profiled surface's documented failure mode
        (see test_known_degenerate_lane below) — and is excluded here."""
        batch, init = _batch()
        tols = dict(tol_grad=1e-8, tol_f=1e-14)
        joint = make_gpr_core()
        prof = make_gpr_core(profile_variance=True)
        rj = run_tile_batch(batch, init, make_batched_runner(joint, max_iter=300, **tols), joint)
        rp = run_tile_batch(batch, init, make_batched_runner(prof, max_iter=300, **tols), prof)
        assert rp["converged"].all() and rj["converged"].all()
        ok = np.abs(rp["objective"] - rj["objective"]) < 1e-5
        assert ok.sum() >= 7, f"too many degenerate lanes: {np.where(~ok)[0]}"
        for k in ["lengthscales", "kernel_variance", "likelihood_variance"]:
            # atol floors the comparison for noise variances that converge
            # to numerically-zero (~1e-14) in both runs
            np.testing.assert_allclose(rp[k][ok], rj[k][ok], rtol=2e-3, atol=1e-10, err_msg=k)
        np.testing.assert_allclose(rp["f_mean"][ok], rj["f_mean"][ok], atol=1e-5)

    def test_known_degenerate_lane(self):
        """Documented caveat: the concentrated surface makes the pure-noise
        stationary point (lengthscales -> 0, model = nugget) reachable in
        the first optimizer steps because sigma2 adapts instantly — lane 3
        of seed 0 lands there with a WORSE objective than the joint path.
        This is why profile_variance stays opt-in (make_gpr_core docs)."""
        batch, init = _batch()
        tols = dict(tol_grad=1e-8, tol_f=1e-14)
        joint = make_gpr_core()
        prof = make_gpr_core(profile_variance=True)
        rj = run_tile_batch(batch, init, make_batched_runner(joint, max_iter=300, **tols), joint)
        rp = run_tile_batch(batch, init, make_batched_runner(prof, max_iter=300, **tols), prof)
        lane = 3
        assert np.all(rp["lengthscales"][lane] < 1e-6), "collapse signature changed — update docs"
        assert rp["objective"][lane] > rj["objective"][lane] + 1.0

    def test_profiled_value_equals_joint_at_mapped_params(self):
        """lml_profiled(ls, tau) == lml_joint(ls, sigma2_hat, tau*sigma2_hat)."""
        from gpsat_tpu.ops.fused_lml import (
            masked_gpr_lml_fused,
            masked_gpr_lml_profiled,
            profiled_sigma2,
        )

        rng = np.random.default_rng(1)
        N, D = 40, 2
        X = jnp.asarray(rng.uniform(-3, 3, (N, D)))
        y = jnp.asarray(np.sin(rng.uniform(-3, 3, N)))
        mask = jnp.asarray((np.arange(N) < 34).astype(float))
        ls = jnp.asarray([1.2, 0.8])
        tau = jnp.asarray(0.07)
        z = jnp.asarray(0.0)
        sig2 = profiled_sigma2("Matern32", X, y, mask, ls, tau, z)
        v_prof = masked_gpr_lml_profiled("Matern32", X, y, mask, ls, tau, z)
        v_joint = masked_gpr_lml_fused("Matern32", X, y, mask, ls, sig2, tau * sig2, z)
        np.testing.assert_allclose(float(v_prof), float(v_joint), rtol=1e-12)

    @pytest.mark.parametrize("kernel", ["Matern12", "Matern32", "Matern52", "RBF"])
    def test_profiled_vjp_matches_autodiff(self, kernel):
        """The hand-derived envelope gradients == autodiff of the plain
        profiled formula (f64)."""
        from gpsat_tpu.ops import kernels as K
        from gpsat_tpu.ops import linalg as LA
        from gpsat_tpu.ops.fused_lml import masked_gpr_lml_profiled

        rng = np.random.default_rng(2)
        N, D = 30, 2
        X = jnp.asarray(rng.uniform(-3, 3, (N, D)))
        y = jnp.asarray(np.sin(rng.uniform(-3, 3, N)))
        mask = jnp.asarray((np.arange(N) < 26).astype(float))
        z = jnp.asarray(0.0)

        def plain(ls, tau, yv):
            m = mask
            n = jnp.sum(m)
            A = LA.add_diag(K.gram(kernel, X, X, ls, jnp.asarray(1.0)), tau)
            Am = LA.mask_gram(A, m)
            L = jnp.linalg.cholesky(Am)
            v = jax.scipy.linalg.solve_triangular(L, (yv * m)[:, None], lower=True)
            sig2 = jnp.sum(v * v) / n
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            return -0.5 * n * (1.0 + jnp.log(sig2)) - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)

        def fused(ls, tau, yv):
            return masked_gpr_lml_profiled(kernel, X, yv, mask, ls, tau, z)

        args = (jnp.asarray([1.1, 0.7]), jnp.asarray(0.05), y)
        v1, g1 = jax.value_and_grad(plain, argnums=(0, 1, 2))(*args)
        v2, g2 = jax.value_and_grad(fused, argnums=(0, 1, 2))(*args)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
        for a, b, name in zip(g1, g2, ["ls", "tau", "y"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10, err_msg=name)

    def test_constraint_gate(self):
        from gpsat_tpu.ops import transforms as T

        with pytest.raises(AssertionError, match="profile_variance requires"):
            make_gpr_core(
                profile_variance=True,
                bijectors={
                    "lengthscales": T.POSITIVE,
                    "kernel_variance": T.interval(0.1, 2.0),
                    "likelihood_variance": T.POSITIVE,
                },
            )

    def test_all_masked_lane_finite(self):
        """Batch-padding lanes (mask all zero, engine.py pad_batch_to) must
        give a finite 0 objective and finite (zero) gradients — not the
        0/0 NaN of sig2 = quad/n (regression: round-3 review finding)."""
        from gpsat_tpu.ops.fused_lml import masked_gpr_lml_profiled, profiled_sigma2

        N, D = 16, 2
        X = jnp.zeros((N, D))
        y = jnp.zeros(N)
        mask = jnp.zeros(N)
        z = jnp.asarray(0.0)

        # fused custom-vjp path
        def fused(ls, tau):
            return masked_gpr_lml_profiled("Matern32", X, y, mask, ls, tau, z)

        v, g = jax.value_and_grad(fused, argnums=(0, 1))(jnp.asarray([1.0, 1.0]), jnp.asarray(0.1))
        assert float(v) == 0.0
        assert all(np.all(np.isfinite(np.asarray(gi))) for gi in g)
        assert float(profiled_sigma2("Matern32", X, y, mask, jnp.ones(2), jnp.asarray(0.1), z)) == 1.0

        # f64 reference (autodiff) path via the core objective
        prof = make_gpr_core(profile_variance=True)
        u = prof.inverse({"lengthscales": np.ones(D), "kernel_variance": np.asarray(1.0),
                          "likelihood_variance": np.asarray(0.1)})
        data = {"X": X, "y": y, "mask": mask}
        v2, g2 = jax.value_and_grad(lambda uu: prof.objective(uu, data))(u)
        assert float(v2) == 0.0
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g2))

    def test_predict_only_reports_joint_objective(self):
        """optimise=False runs load STANDARD (kv, lv) params; the stored
        'objective' must be the joint neg-LML there, not the profiled
        objective reading the lv slot as tau (regression: round-3 review)."""
        batch, init = _batch(B=4, N=48, seed=5)
        joint = make_gpr_core()
        prof = make_gpr_core(profile_variance=True)
        rj = run_tile_batch(batch, init, make_batched_runner(joint, optimise=False), joint)
        rp = run_tile_batch(batch, init, make_batched_runner(prof, optimise=False), prof)
        np.testing.assert_allclose(rp["objective"], rj["objective"], rtol=1e-12)
        np.testing.assert_allclose(rp["f_mean"], rj["f_mean"], rtol=1e-10)

    def test_profiled_with_mean_function(self):
        """Profiling composes with a trainable Constant mean (the y
        cotangent carries the mean gradient through center_y)."""
        batch, init = _batch(B=4, N=48, seed=3)
        # shift the field so the mean matters
        batch = TileBatch(**{**batch.__dict__, "y": batch.y + 2.5})
        init = {**init, "mean_c": np.zeros(batch.X.shape[0])}
        tols = dict(tol_grad=1e-8, tol_f=1e-14)
        prof = make_gpr_core(profile_variance=True, mean_function="Constant")
        rp = run_tile_batch(batch, init, make_batched_runner(prof, max_iter=300, **tols), prof)
        assert rp["converged"].all()
        assert np.all(np.abs(rp["mean_c"] - 2.5) < 0.5)
