"""Masked dense linear algebra for padded expert tiles.

The reference fits each local expert on a ragged, dynamically-selected data
subset (ref: GPSat/local_experts.py:930-1260 serial loop; LAPACK Cholesky in
GPSat/models/pure_python_gpr.py:485-488). Ragged shapes are hostile to XLA,
so the TPU design pads every tile to a bucket size Nmax and carries a
row-validity mask. Padded rows/columns are neutralized *inside* the Gram
matrix (identity row/col trick) so that:

  - cholesky(K_masked) has unit diagonal on padded rows  -> logdet unaffected
  - solves give zero on padded rows (y is zeroed there)  -> quadratic form,
    predictions and gradients are exactly those of the unpadded problem.

All functions are single-tile [N, ...]; batch with vmap and shard with
shard_map over the expert axis.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

Array = jnp.ndarray

DEFAULT_JITTER = 1e-6

# fast-path policy: float32 (TPU production mode) uses the materialized
# blocked triangular inverse so solves become matmuls; float64 (CPU
# reference-parity mode) keeps exact triangular solves. Override with
# set_fast_inverse(True/False).
_FAST_INVERSE = None


def set_fast_inverse(value):
    global _FAST_INVERSE
    _FAST_INVERSE = value


def use_fast_inverse(dtype) -> bool:
    if _FAST_INVERSE is not None:
        return bool(_FAST_INVERSE)
    return jnp.dtype(dtype) == jnp.float32


def mask_gram(K: Array, mask: Array, diag_value: float = 1.0) -> Array:
    """Zero padded rows/cols of K and put ``diag_value`` on padded diagonal.

    K: [N, N], mask: [N] (1.0 valid / 0.0 padded).
    """
    m = mask.astype(K.dtype)
    outer = m[:, None] * m[None, :]
    Km = K * outer
    diag_fix = (1.0 - m) * diag_value
    return Km + jnp.diag(diag_fix)


def add_diag(K: Array, value: Array) -> Array:
    return K + value * jnp.eye(K.shape[0], dtype=K.dtype)


def cholesky(K: Array) -> Array:
    """Cholesky dispatch. Default: jnp.linalg.cholesky (XLA). The
    VMEM-resident Pallas kernel (gpsat_tpu.ops.pallas.cholesky) is an
    opt-in experiment (GPSAT_PALLAS_CHOL=1) that measured ~2x SLOWER on
    v5e — the faster factor path is the fused diag-block pair
    (chol_winv_pair, GPSAT_BLOCK_CHOL), which the fused LML routes to."""
    from gpsat_tpu.ops.pallas.cholesky import cholesky as _pchol

    return _pchol(K)


def safe_cholesky(K: Array, jitter: float = 0.0):
    """Cholesky with optional jitter; returns (L, ok_flag).

    ok is False if the factorization produced NaNs (the batched analogue of
    the reference's LinAlgError -> inf-objective fallback,
    ref: GPSat/models/pure_python_gpr.py:499-501).
    """
    if jitter:
        K = add_diag(K, jnp.asarray(jitter, dtype=K.dtype))
    L = cholesky(K)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(L)))
    return L, ok


def tri_solve(L: Array, B: Array, *, lower: bool = True, trans: bool = False) -> Array:
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


def tri_inv_blocked(L: Array, T: int = 64) -> Array:
    """W = L^-1 for lower-triangular L [N, N], blocked for TPU.

    XLA's TriangularSolve runs ~N sequential substitution steps regardless
    of batch, which dominates the masked-LML cost on TPU (measured: two
    N=512 solves cost ~2x the whole Cholesky). Here only the T-sized
    diagonal blocks are solved (stacked into one batched solve, T
    sequential steps), and every off-diagonal block is an MXU matmul:
      W[i,i] = inv(L[i,i]);  W[i,k] = -W[i,i] (sum_j L[i,j] W[j,k]).
    With W materialized, all downstream solves become matmuls.

    T=64 measured fastest at the canonical [512, 512, 512] f32 batch on
    v5e (42.3 / 54.0 / 58.7 ms for T=64/128/256): fewer sequential
    substitution steps in the stacked diagonal solve outweigh the smaller
    off-diagonal matmuls.
    """
    N = L.shape[-1]
    if N <= T:
        return tri_solve(L, jnp.eye(N, dtype=L.dtype))
    if N % T != 0:
        # identity-pad to the next block multiple: inv([[L,0],[0,I]]) =
        # [[L^-1,0],[0,I]], so the top-left slice of the padded inverse is
        # exact. Keeps e.g. the reference's M=500 inducing set on the
        # blocked (matmul-rich) path instead of a 500-step solve.
        P = N + (-N) % T
        Lp = jnp.eye(P, dtype=L.dtype).at[:N, :N].set(L)
        return tri_inv_blocked(Lp, T=T)[:N, :N]
    nblk = N // T
    eyeT = jnp.eye(T, dtype=L.dtype)
    Lb = [[L[i * T : (i + 1) * T, k * T : (k + 1) * T] for k in range(nblk)] for i in range(nblk)]
    diag = jnp.stack([Lb[i][i] for i in range(nblk)])
    Wdiag = jax.vmap(lambda Li: jax.scipy.linalg.solve_triangular(Li, eyeT, lower=True))(diag)

    Wb = [[None] * nblk for _ in range(nblk)]
    for i in range(nblk):
        Wb[i][i] = Wdiag[i]
    for i in range(1, nblk):
        for k in range(i - 1, -1, -1):
            acc = None
            for j in range(k, i):
                term = jnp.matmul(Lb[i][j], Wb[j][k], precision=jax.lax.Precision.HIGHEST)
                acc = term if acc is None else acc + term
            Wb[i][k] = -jnp.matmul(Wdiag[i], acc, precision=jax.lax.Precision.HIGHEST)

    zero = jnp.zeros((T, T), dtype=L.dtype)
    rows = [jnp.concatenate([Wb[i][k] if k <= i else zero for k in range(nblk)], axis=1) for i in range(nblk)]
    return jnp.concatenate(rows, axis=0)


import contextlib as _contextlib
import contextvars as _contextvars

# trace-time (base, micro) override for the recursive factor pair.
# CAVEAT (measured, BENCH_MODELS_r05.log): this must wrap the code that
# TRANSFORMS/TRACES the program (e.g. the engine's runner call), not a
# model-internal call site — custom-vmap rule application is deferred to
# transform time, so a `with` inside a core's math never reaches it (an
# ASVGP-internal pin measurably did nothing: steady 1.05/1.07 s == the
# 1.01 s default, while env GPSAT_CHOL_BASE/MICRO did change the graph).
# The r5 zoo A/B verdict stands on the env knobs: global (64, 32) default
# (GPR +7%, SVGP wash); ASVGP's apparent (32, 8) win decomposed into an
# f32-trajectory iteration-count artifact (iters_max 20 vs 23) plus a
# <= 3% per-iteration residual — no per-core pin shipped.
_CHOL_BLOCKING = _contextvars.ContextVar("gpsat_chol_blocking", default=None)


@_contextlib.contextmanager
def chol_blocking(base: int, micro: int):
    """Override the recursive factor pair's (base, micro) for calls traced
    inside this context (trace-time; compiled programs bake it in). Wrap
    the jit/vmap TRACING call, not model-internal math (see caveat above)."""
    tok = _CHOL_BLOCKING.set((int(base), int(micro)))
    try:
        yield
    finally:
        _CHOL_BLOCKING.reset(tok)


def chol_winv_recursive(K: Array, base: int | None = None, micro: int | None = None):
    """(L, W = L^-1) via the statically-unrolled recursive factor pair
    (ops/recursive_chol.py): no While loops, no triangular solves — the
    base-block rank-1 chains fuse and everything else is MXU matmuls.

    base/micro default from GPSAT_CHOL_BASE / GPSAT_CHOL_MICRO (64 / 32),
    the A/B knobs for the sequential-depth sweep (bench_factor.py): the
    diagonal chain runs N/base base blocks x base/micro scan steps, so
    raising micro trades While-loop dispatches for a bigger unrolled
    step body. (64, 32) is the same-session default-bench winner on v5e
    (BENCH_AB_CHOL_r05.log: 333-341 experts/s vs 320-328 at the old
    (32, 8) default; (64, 16) and (128, 32) are both ~9% SLOWER than
    (32, 8) — sequential depth alone does not decide it, the scan-step
    shape does)."""
    import os

    from gpsat_tpu.ops.recursive_chol import chol_winv_recursive as _rec

    ctx = _CHOL_BLOCKING.get()
    if base is None:
        base = ctx[0] if ctx else int(os.environ.get("GPSAT_CHOL_BASE", "64"))
    if micro is None:
        micro = ctx[1] if ctx else int(os.environ.get("GPSAT_CHOL_MICRO", "32"))
    return _rec(K, base=base, micro=micro)


def _recursive_gate(flag_name: str, default: str = "0") -> bool:
    """Shared trace-time gate semantics for the recursive factor paths:
    '1' = on for non-CPU backends, 'force' = on anywhere, '0' = off."""
    import os

    flag = os.environ.get(flag_name, default)
    if flag not in ("1", "force"):
        return False
    if flag == "force":
        return True
    try:
        import jax.extend.backend as _be

        return _be.get_backend().platform not in ("cpu",)
    except Exception:  # noqa: BLE001 — probe failure must not crash tracing
        return False


def recursive_path_enabled(K: Array) -> bool:
    """Trace-time gate for the recursive factor pair in the fused LML
    (GPSAT_RECURSIVE_CHOL). Any N and dtype are legal (the recursion
    splits at n//2; ragged sizes land in the base case).

    DEFAULT ON for non-CPU backends (set '0' to fall back to the XLA
    cholesky expander): same-session TPU A/B measured 2.1x on the default
    bench (152 -> 317.6 experts/s, converged 512/512, iters unchanged)
    with factor parity ~2e-5 rel at cond 1e6 and fused value/grad parity
    8e-7 / 4.6e-5 (BENCH_r04 notes)."""
    return _recursive_gate("GPSAT_RECURSIVE_CHOL", default="1")


def recursive_pair_enabled(K: Array) -> bool:
    """Trace-time gate for routing the SHARED (L, W = L^-1) factor pair —
    chol_winv / chol_winv_pair / chol_winv_padded, i.e. the SGPR/SVGP/
    VFF/ASVGP Kuu-and-B factors and GPR's posterior factors — through the
    recursive kernel (GPSAT_RECURSIVE_PAIR). Kept separate from
    GPSAT_RECURSIVE_CHOL (the fused-LML hot path) so each can be measured
    and defaulted independently.

    DEFAULT ON for non-CPU backends when the factor side is at least
    GPSAT_RECURSIVE_PAIR_MIN (default 128). Same-session TPU zoo A/B
    (B=128, N=512, BENCH_MODELS logs r4): SGPR 160 -> 220 experts/s
    (M=128 factors), VFF 82 -> 121 (P=361), ASVGP 80 -> 155, GPR ~neutral
    — but SVGP's collapsed solver (M=64 factors) REGRESSED 160 -> 113:
    below ~128 the recursion is nearly all sequential base-scan steps and
    dispatch with no cross-block matmul tree to win on, so small factors
    stay on the XLA expander. 'force' bypasses both the backend and size
    gates (CPU parity tests)."""
    import os

    if os.environ.get("GPSAT_RECURSIVE_PAIR", "1") == "force":
        return True
    if int(K.shape[-1]) < int(os.environ.get("GPSAT_RECURSIVE_PAIR_MIN", "128")):
        return False
    return _recursive_gate("GPSAT_RECURSIVE_PAIR", default="1")


def chol_inv(K: Array, T: int = 64):
    """(L, W=L^-1) of an SPD matrix — the TPU fast path's factor pair.
    T default matches tri_inv_blocked's measured-best block size."""
    L = cholesky(K)
    return L, tri_inv_blocked(L, T)


# ---------------------------------------------------------------------------
# Stacked-panel factor pair: Cholesky + diagonal-block inverses in one pass.
#
# The per-expert objectives run under vmap; a pallas_call inside vmap gets a
# singleton leading block dimension, which Mosaic's layout inference rejects
# (3-d refs, layout.h:320). custom_vmap sidesteps this: the UNBATCHED rule is
# plain XLA, and the BATCHED rule hands the whole expert batch to the 2-d
# stacked-panel kernel (ops/pallas/panel_chol) with the O(N^3) trailing
# updates as XLA batched matmuls.
# ---------------------------------------------------------------------------

_PANEL_T = 128
_GATE_WARNED = set()


def _pallas_gate(env_var: str, K: Array, block: int, pad_ok: bool = False) -> bool:
    """Shared trace-time gate for the opt-in Pallas factor paths.

    '1' = on for non-CPU backends; 'force' = on anywhere (CPU test suites
    run the kernels in interpret mode). pad_ok judges the identity-padded
    size instead of requiring an exact block multiple.
    """
    import os
    import warnings

    flag = os.environ.get(env_var, "0")
    if flag not in ("1", "force"):
        return False
    N = K.shape[-1]
    if pad_ok:
        N = N + (-N) % block
    if K.dtype != jnp.float32 or N % block != 0 or N < 2 * block:
        return False
    if flag == "force":
        return True
    try:
        import jax.extend.backend as _be

        return _be.get_backend().platform not in ("cpu",)
    except Exception as e:  # noqa: BLE001 — probe failure must not crash tracing
        # a silent False here would quietly disable an explicitly requested
        # perf path (e.g. after a JAX API move) — say so, once per flag
        if env_var not in _GATE_WARNED:
            _GATE_WARNED.add(env_var)
            warnings.warn(
                f"{env_var}={flag} requested but the backend probe failed "
                f"({e!r}); falling back to the default factor path"
            )
        return False


def panel_path_enabled(K: Array) -> bool:
    """Static (trace-time) gate for the stacked-panel factor path.

    Default OFF: measured 2.6x SLOWER than the XLA path on v5e — VMEM
    caps the per-grid-step block count at 8, so the kernel serializes
    16 grid repeats x 128 steps x 4 panels = 8192 sequential steps where
    XLA's batched Cholesky pays only N=512 fat ones. On a single
    TensorCore, Cholesky is latency-bound by sequential-step count and
    XLA already minimizes it; kept as an opt-in experiment + the
    correctness harness for future multi-core / larger-VMEM parts.
    """
    return _pallas_gate("GPSAT_PALLAS_PANEL", K, _PANEL_T)


def _diag_blocks(L: Array, T: int) -> Array:
    Nb = L.shape[-1] // T
    return jnp.stack([L[p * T : (p + 1) * T, p * T : (p + 1) * T] for p in range(Nb)])


def _chol_panel_pair_unbatched(K: Array):
    L = cholesky(K)
    T = _PANEL_T
    eyeT = jnp.eye(T, dtype=L.dtype)
    Wdiag = jax.vmap(lambda Li: jax.scipy.linalg.solve_triangular(Li, eyeT, lower=True))(
        _diag_blocks(L, T)
    )
    return L, Wdiag


def _chol_panels_batched(K: Array):
    """Right-looking blocked Cholesky of [B, N, N]: panel factorizations on
    the pallas stacked kernel, trailing updates as MXU batched matmuls.
    Returns (L [B, N, N], Wdiag [B, Nb, T, T])."""
    from gpsat_tpu.ops.pallas.panel_chol import factor_panels

    T = _PANEL_T
    hi = jax.lax.Precision.HIGHEST
    B, N, _ = K.shape
    Nb = N // T
    A = K
    cols = []
    Wdiags = []
    for p in range(Nb):
        D = A[:, :T, :T]
        Ld, Di = factor_panels(D)
        Wdiags.append(Di)
        if p < Nb - 1:
            rest = A[:, T:, :T]  # [B, R, T]
            Lpan = jnp.matmul(rest, jnp.swapaxes(Di, 1, 2), precision=hi)
            A = A[:, T:, T:] - jnp.matmul(Lpan, jnp.swapaxes(Lpan, 1, 2), precision=hi)
            col = jnp.concatenate([Ld, Lpan], axis=1)  # [B, N - p*T, T]
        else:
            col = Ld
        cols.append(jnp.pad(col, ((0, 0), (p * T, 0), (0, 0))))
    L = jnp.concatenate(cols, axis=2)
    return L, jnp.stack(Wdiags, axis=1)


from jax import custom_batching as _cb


@_cb.custom_vmap
def chol_panel_pair(K: Array):
    """(L, Wdiag) where Wdiag[p] = inv(L[pT:(p+1)T, pT:(p+1)T]).

    Under vmap (the expert batch) this routes to the pallas stacked-panel
    driver; unbatched it is plain XLA.
    """
    return _chol_panel_pair_unbatched(K)


@chol_panel_pair.def_vmap
def _chol_panel_pair_vmap(axis_size, in_batched, K):
    (k_batched,) = in_batched
    if not k_batched:
        out = _chol_panel_pair_unbatched(K)
        return out, (False, False)
    return _chol_panels_batched(K), (True, True)


def tri_inv_from_diag(L: Array, Wdiag: Array, T: int = _PANEL_T) -> Array:
    """W = L^-1 given precomputed diagonal-block inverses (tri_inv_blocked
    with its stacked diagonal solve already paid by the panel kernel)."""
    N = L.shape[-1]
    nblk = N // T
    Lb = [[L[i * T : (i + 1) * T, k * T : (k + 1) * T] for k in range(nblk)] for i in range(nblk)]
    Wb = [[None] * nblk for _ in range(nblk)]
    for i in range(nblk):
        Wb[i][i] = Wdiag[i]
    for i in range(1, nblk):
        for k in range(i - 1, -1, -1):
            acc = None
            for j in range(k, i):
                term = jnp.matmul(Lb[i][j], Wb[j][k], precision=jax.lax.Precision.HIGHEST)
                acc = term if acc is None else acc + term
            Wb[i][k] = -jnp.matmul(Wdiag[i], acc, precision=jax.lax.Precision.HIGHEST)
    zero = jnp.zeros((T, T), dtype=L.dtype)
    rows = [jnp.concatenate([Wb[i][k] if k <= i else zero for k in range(nblk)], axis=1) for i in range(nblk)]
    return jnp.concatenate(rows, axis=0)


def tri_solve_from_diag(L: Array, Wdiag: Array, b: Array, T: int = _PANEL_T) -> Array:
    """Solve L v = b (lower) by block forward substitution using the
    precomputed diagonal-block inverses: Nb block steps of matmuls instead
    of XLA's N sequential scalar substitution steps."""
    N = L.shape[-1]
    nblk = N // T
    hi = jax.lax.Precision.HIGHEST
    vs = []
    for p in range(nblk):
        rhs = b[p * T : (p + 1) * T]
        for j in range(p):
            rhs = rhs - jnp.matmul(L[p * T : (p + 1) * T, j * T : (j + 1) * T], vs[j], precision=hi)
        vs.append(jnp.matmul(Wdiag[p], rhs, precision=hi))
    return jnp.concatenate(vs, axis=0)


# ---------------------------------------------------------------------------
# Fused factor pair v3: diagonal-block Pallas kernel (chol + inverse in one
# loop, ops/pallas/block_chol) + XLA MXU trailing updates and inverse
# assembly. See block_chol.py's module docstring for why this layout wins
# where the two earlier kernels lost.
# ---------------------------------------------------------------------------

_BLOCK_T = 64


def block_path_enabled(K: Array, pad_ok: bool = False) -> bool:
    """Static (trace-time) gate for the fused diag-block factor path.

    pad_ok: judge the identity-padded size (chol_winv_padded) instead of
    requiring an exact block multiple — for e.g. M=500 inducing sets.
    """
    return _pallas_gate("GPSAT_BLOCK_CHOL", K, _BLOCK_T, pad_ok=pad_ok)


def _chol_winv_batched(K: Array):
    """Blocked Cholesky + full triangular inverse of [B, N, N] tiles.

    Panel factorizations (and their block inverses) come from the fused
    Pallas kernel; everything O(N^3) — panel scaling, trailing updates,
    off-diagonal inverse assembly — is XLA batched MXU matmuls.
    Returns (L, W = L^-1), both [B, N, N].
    """
    from gpsat_tpu.ops.pallas.block_chol import factor_blocks_auto

    T = _BLOCK_T
    hi = jax.lax.Precision.HIGHEST
    B, N, _ = K.shape
    # non-multiples must come through chol_winv_padded; silently flooring
    # Nb would drop trailing rows/cols
    assert N % T == 0, f"N={N} not a multiple of T={T}; use chol_winv_padded"
    Nb = N // T

    A = K
    cols = []
    Wdiags = []
    for p in range(Nb):
        D = A[:, :T, :T]
        Ld, Di = factor_blocks_auto(D)
        Wdiags.append(Di)
        if p < Nb - 1:
            rest = A[:, T:, :T]  # [B, R, T]
            Lpan = jnp.matmul(rest, jnp.swapaxes(Di, 1, 2), precision=hi)
            A = A[:, T:, T:] - jnp.matmul(Lpan, jnp.swapaxes(Lpan, 1, 2), precision=hi)
            col = jnp.concatenate([Ld, Lpan], axis=1)  # [B, N - p*T, T]
        else:
            col = Ld
        cols.append(jnp.pad(col, ((0, 0), (p * T, 0), (0, 0))))
    L = jnp.concatenate(cols, axis=2)

    # W assembly, one block-column at a time: for column k, row-block i
    # needs W rows k..i-1 of the same column — a single fat matmul
    # [B, T, (i-k)T] x [B, (i-k)T, T] per (i, k) instead of (i-k) thin ones.
    Wcols = []
    for k in range(Nb):
        Wcol = [jnp.zeros((B, T, T), dtype=K.dtype)] * k + [Wdiags[k]]
        for i in range(k + 1, Nb):
            Lrow = L[:, i * T : (i + 1) * T, k * T : i * T]  # [B, T, (i-k)T]
            stacked = jnp.concatenate(Wcol[k:i], axis=1)  # [B, (i-k)T, T]
            acc = jnp.matmul(Lrow, stacked, precision=hi)
            Wcol.append(-jnp.matmul(Wdiags[i], acc, precision=hi))
        Wcols.append(jnp.concatenate(Wcol, axis=1))  # [B, N, T]
    W = jnp.concatenate(Wcols, axis=2)
    return L, W


def _chol_winv_unbatched(K: Array):
    if recursive_pair_enabled(K):
        return chol_winv_recursive(K)
    L = cholesky(K)
    return L, tri_inv_blocked(L)


@_cb.custom_vmap
def chol_winv_pair(K: Array):
    """(L, W = L^-1) of one SPD tile. Under the expert vmap this routes to
    the fused diag-block Pallas driver on the whole batch; unbatched it is
    the plain XLA path."""
    return _chol_winv_unbatched(K)


@chol_winv_pair.def_vmap
def _chol_winv_pair_vmap(axis_size, in_batched, K):
    (k_batched,) = in_batched
    if not k_batched:
        out = _chol_winv_unbatched(K)
        return out, (False, False)
    if recursive_pair_enabled(K):
        # the recursive kernel is batch-native (matmuls broadcast, the
        # base scan carries [B, base, base]) — no panel driver needed
        return chol_winv_recursive(K), (True, True)
    return _chol_winv_batched(K), (True, True)


@jax.custom_vjp
def chol_winv(K: Array):
    """Differentiable (L, W = L^-1) factor pair.

    Same routing as chol_winv_pair (fused Pallas driver under the expert
    vmap when GPSAT_BLOCK_CHOL is on) but safe to autodiff through — the
    Pallas kernel has no JVP rule, so consumers whose gradients flow
    through the factorization (SGPR/SVGP collapsed bounds, VFF) must use
    this wrapper. GPR's fused LML (custom_vjp, gradients never reach the
    factor) uses chol_winv_pair directly.
    """
    return chol_winv_pair(K)


def _chol_winv_fwd(K):
    L, W = chol_winv_pair(K)
    return (L, W), (L, W)


def _chol_winv_bwd(res, cot):
    L, W = res
    dL, dW = cot
    hi = jax.lax.Precision.HIGHEST
    # W = L^-1 contribution: vjp through matrix inverse, dL += -W^T dW W^T.
    # Cotangents on W's structurally-zero upper triangle are meaningless
    # (the primal is exactly zero there) — mask before propagating, and
    # keep only the lower triangle of the combined dL (strict upper of L
    # is structurally zero too).
    dWl = jnp.tril(dW)
    dLtot = jnp.tril(
        dL - jnp.matmul(W.T, jnp.matmul(dWl, W.T, precision=hi), precision=hi)
    )
    # standard Cholesky pullback (Murray 2016): dK = symmetrize of
    # L^-T Phi(L^T dL) L^-1 with Phi = tril, halved diagonal — W is in
    # hand, so the two triangular solves are matmuls here
    M = jnp.matmul(L.T, dLtot, precision=hi)
    Phi = jnp.tril(M) - 0.5 * jnp.diagonal(M)[..., None] * jnp.eye(M.shape[-1], dtype=M.dtype)
    dK = jnp.matmul(W.T, jnp.matmul(Phi, W, precision=hi), precision=hi)
    return (0.5 * (dK + dK.T),)


chol_winv.defvjp(_chol_winv_fwd, _chol_winv_bwd)


def chol_winv_padded(K: Array, T: int = _BLOCK_T):
    """chol_winv with identity padding to the next block multiple.

    chol([[K, 0], [0, I]]) = [[L, 0], [0, I]] and likewise for the inverse,
    so the top-left slices are exact — keeps non-block-multiple sizes
    (e.g. the reference's M=500 inducing sets) on the fused kernel path.
    Differentiable: pad/slice are linear, chol_winv carries the VJP.
    """
    N = K.shape[-1]
    if recursive_pair_enabled(K):
        return chol_winv(K)  # recursive primal handles any N — skip the pad
    pad = (-N) % T
    if pad == 0:
        return chol_winv(K)
    P = N + pad
    Kp = jnp.eye(P, dtype=K.dtype).at[:N, :N].set(K)
    L, W = chol_winv(Kp)
    return L[:N, :N], W[:N, :N]


def cho_solve(L: Array, B: Array) -> Array:
    """Solve K x = B given K = L L^T."""
    return tri_solve(L, tri_solve(L, B), trans=True)


def logdet_from_chol(L: Array) -> Array:
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def masked_gpr_lml(
    X: Array,
    y: Array,
    mask: Array,
    lengthscales: Array,
    kernel_variance: Array,
    likelihood_variance: Array,
    *,
    kernel: str = "Matern32",
    jitter: float = 0.0,
) -> Array:
    """Log marginal likelihood of exact GPR on one padded tile.

    lml = -1/2 y^T K^-1 y - 1/2 log|K| - n/2 log(2 pi),  K = Kf + sigma_n^2 I
    (Rasmussen & Williams Algo 2.1; reference formula at
    GPSat/models/pure_python_gpr.py:439-506). n = sum(mask).
    """
    from gpsat_tpu.ops import kernels as _k

    m = mask.astype(X.dtype)
    n = jnp.sum(m)
    Kf = _k.gram(kernel, X, X, lengthscales, kernel_variance)
    K = add_diag(Kf, likelihood_variance + jitter)
    Km = mask_gram(K, m)
    L = cholesky(Km)
    ym = (y * m)[:, None]
    if use_fast_inverse(X.dtype):
        W = tri_inv_blocked(L)
        v = jnp.matmul(W, ym, precision=jax.lax.Precision.HIGHEST)
        quad = jnp.sum(v * v)
    else:
        alpha = cho_solve(L, ym)
        quad = jnp.sum(ym * alpha)
    logdet = logdet_from_chol(L)
    return -0.5 * quad - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
