"""GPSAT_RECURSIVE_PAIR routing parity: the recursive (L, W) factor pair
must be a drop-in for the blocked XLA pair everywhere chol_winv /
chol_winv_pair / chol_winv_padded serve it (SGPR/SVGP/VFF/ASVGP Kuu+B
factors, GPR posterior factors) — values AND gradients (the chol_winv
custom VJP wraps whichever primal is routed).

CPU tests use 'force' (the '1' setting only fires off-CPU).
"""

import numpy as np
import pytest


@pytest.fixture
def pair_force(monkeypatch):
    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "force")


def _spd(n, b=None, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    shape = (b, n, n) if b else (n, n)
    A = rng.standard_normal(shape).astype(dtype) / np.sqrt(n)
    return A @ np.swapaxes(A, -1, -2) + np.eye(n, dtype=dtype)


def test_pair_values_match_blocked(pair_force):
    import jax
    import jax.numpy as jnp

    from gpsat_tpu.ops import linalg as LA

    for n in (64, 100, 128, 257):
        K = jnp.asarray(_spd(n, seed=n))
        L, W = LA.chol_winv_padded(K)
        Lref = np.linalg.cholesky(np.asarray(K, np.float64))
        assert np.allclose(np.asarray(L, np.float64), Lref, atol=5e-4), f"L mismatch at n={n}"
        eye = np.asarray(jnp.matmul(W, L, precision=jax.lax.Precision.HIGHEST))
        assert np.abs(eye - np.eye(n, dtype=np.float32)).max() < 5e-4, f"W L != I at n={n}"


def test_pair_vmap_batched_route(pair_force):
    import jax
    import jax.numpy as jnp

    from gpsat_tpu.ops import linalg as LA

    K = jnp.asarray(_spd(96, b=7, seed=5))
    L, W = jax.vmap(LA.chol_winv)(K)
    eye = np.asarray(jnp.matmul(W, L, precision=jax.lax.Precision.HIGHEST))
    assert np.abs(eye - np.eye(96, dtype=np.float32)).max() < 5e-4


def test_chol_winv_gradients_match(monkeypatch):
    """d sum(L + W) / dK identical (to f32 tolerance) with the pair
    routed through the recursive primal vs the default — the custom VJP
    (Murray pullback) consumes only (L, W)."""
    import jax
    import jax.numpy as jnp

    from gpsat_tpu.ops import linalg as LA

    K = jnp.asarray(_spd(64, seed=3))

    def loss(K):
        L, W = LA.chol_winv(K)
        return jnp.sum(L) + jnp.sum(W * W)

    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "0")
    g0 = np.asarray(jax.grad(loss)(K), np.float64)
    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "force")
    g1 = np.asarray(jax.jit(jax.grad(loss))(K), np.float64)
    rel = np.abs(g1 - g0).max() / np.abs(g0).max()
    assert rel < 1e-4, f"gradient mismatch {rel:.2e}"


def test_pair_size_gate(monkeypatch):
    """Default-on gating: small factors (< GPSAT_RECURSIVE_PAIR_MIN) stay
    on the XLA expander — the measured cutover is SVGP's M=64 regressing
    while SGPR's M=128 wins (see recursive_pair_enabled docstring).
    'force' bypasses the size gate; the CPU backend gate keeps '1' off
    here either way."""
    import jax.numpy as jnp

    from gpsat_tpu.ops import linalg as LA

    small, big = jnp.zeros((64, 64)), jnp.zeros((128, 128))
    monkeypatch.delenv("GPSAT_RECURSIVE_PAIR", raising=False)
    assert not LA.recursive_pair_enabled(small)  # size gate (and CPU backend)
    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "force")
    assert LA.recursive_pair_enabled(small)  # force bypasses both gates
    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "1")
    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR_MIN", "96")
    assert not LA.recursive_pair_enabled(small)  # below threshold
    # 128 >= 96 passes the size gate; on CPU the backend gate still says no
    assert not LA.recursive_pair_enabled(big)
    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "0")
    assert not LA.recursive_pair_enabled(big)


def test_sgpr_objective_parity_under_pair(monkeypatch):
    """SGPR collapsed bound value+grad: flag off vs force agree (the Kuu
    and B factors route through the pair in f32 fast-inverse mode)."""
    import jax
    import jax.numpy as jnp

    from gpsat_tpu.models.sgpr import make_sgpr_core

    rng = np.random.default_rng(0)
    N, M, D = 96, 24, 2
    X = rng.uniform(-2, 2, (N, D)).astype(np.float32)
    y = np.sin(X[:, 0]).astype(np.float32)
    core = make_sgpr_core(num_inducing_points=M)
    cp = core.init_cparams(D, dtype=np.float32)
    cp["inducing_points"] = X[:M].copy()
    up = core.inverse(cp)
    data = {"X": jnp.asarray(X), "y": jnp.asarray(y), "mask": jnp.ones(N, np.float32)}

    def vg():
        f = lambda u: core.objective(u, data)
        v, g = jax.value_and_grad(f)(up)
        return float(v), jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), g)

    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "0")
    v0, g0 = vg()
    monkeypatch.setenv("GPSAT_RECURSIVE_PAIR", "force")
    v1, g1 = vg()
    assert abs(v1 - v0) / max(1.0, abs(v0)) < 1e-4
    flat0 = np.concatenate([np.ravel(v) for v in jax.tree_util.tree_leaves(g0)])
    flat1 = np.concatenate([np.ravel(v) for v in jax.tree_util.tree_leaves(g1)])
    denom = max(1e-3, np.abs(flat0).max())
    assert np.abs(flat1 - flat0).max() / denom < 1e-3
