"""Microbench: batched factor-pair variants at the canonical hot shape.

The headline GPR path's cost anatomy ([B=512, N=512] f32 on one v5e) is
dominated by Cholesky + triangular inversion (docs/architecture.md). This
bench times, same-session (same tunnel, comparable numbers):

  chol_xla       stock jnp.linalg.cholesky               (the production wall)
  pair_xla       cholesky + tri_inv_blocked              (current production pair)
  pair_block     _chol_winv_batched                      (Pallas fused diag-block kernel
                                                          + XLA trailing, ops/pallas/block_chol)
  vg_default     one fused LML value+grad, default path
  vg_block       one fused LML value+grad, GPSAT_BLOCK_CHOL=1 path

Each jitted program ends in a scalar reduction so the host fetch forces
completion (block_until_ready is unreliable through the axon relay).

Usage: python bench_factor.py [--B 512] [--N 512] [--reps 5]
Prints one JSON line per variant.
"""

import argparse
import json
import time

import numpy as np


def _time(fn, x, reps):
    out = float(fn(x))  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(fn(x))
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--N", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep (base, micro) of the recursive factor pair: "
                         "the sequential diagonal chain is N/micro carry "
                         "round-trips, so larger micro trades dispatch "
                         "latency for a bigger unrolled step body")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from gpsat_tpu import enable_compilation_cache

    enable_compilation_cache()
    from gpsat_tpu.ops import linalg as LA

    B, N, reps = args.B, args.N, args.reps
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, N, N)).astype(np.float32) / np.sqrt(N)
    K = A @ np.swapaxes(A, 1, 2) + np.eye(N, dtype=np.float32)
    Kd = jnp.asarray(K)

    flops_chol = B * N**3 / 3 * 2
    flops_pair = flops_chol * 2  # + blocked inverse (~N^3/3 matmul work)

    @jax.jit
    def chol_xla(K):
        return jnp.sum(jnp.linalg.cholesky(K))

    @jax.jit
    def pair_xla(K):
        L = jnp.linalg.cholesky(K)
        W = jax.vmap(LA.tri_inv_blocked)(L)
        return jnp.sum(L) + jnp.sum(W)

    @jax.jit
    def pair_block(K):
        L, W = LA._chol_winv_batched(K)
        return jnp.sum(L) + jnp.sum(W)

    @jax.jit
    def pair_recursive(K):
        L, W = jax.vmap(LA.chol_winv_recursive)(K)
        return jnp.sum(L) + jnp.sum(W)

    results = {}
    for name, fn, fl in [
        ("chol_xla", chol_xla, flops_chol),
        ("pair_xla", pair_xla, flops_pair),
        ("pair_block", pair_block, flops_pair),
        ("pair_recursive", pair_recursive, flops_pair),
    ]:
        # a variant that fails to compile (e.g. a Mosaic regression in the
        # opt-in Pallas path) must not kill the remaining measurements
        try:
            best, med, out = _time(fn, Kd, reps)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"factor_{name}", "error": repr(e)[:300]}), flush=True)
            continue
        results[name] = (best, med)
        print(json.dumps({
            "metric": f"factor_{name}", "B": B, "N": N,
            "best_ms": round(best * 1e3, 2), "median_ms": round(med * 1e3, 2),
            "tflops_at_best": round(fl / best / 1e12, 2), "check": round(out, 2),
        }), flush=True)

    if args.sweep:
        # sequential-depth sweep (VERDICT r4 item 3): N/micro carry steps
        # dominate the wall at this shape, so the winning (base, micro)
        # becomes the GPSAT_CHOL_BASE/GPSAT_CHOL_MICRO default
        import functools

        for base, micro in [(32, 8), (32, 16), (32, 32), (64, 16), (64, 32), (128, 32)]:
            if args.N % base or base % micro:
                continue

            @jax.jit
            def pair_bm(K, _b=base, _m=micro):
                L, W = jax.vmap(functools.partial(
                    LA.chol_winv_recursive, base=_b, micro=_m))(K)
                return jnp.sum(L) + jnp.sum(W)

            try:
                best, med, out = _time(pair_bm, Kd, reps)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"metric": f"factor_rec_b{base}_m{micro}",
                                  "error": repr(e)[:300]}), flush=True)
                continue
            print(json.dumps({
                "metric": f"factor_rec_b{base}_m{micro}", "B": B, "N": N,
                "seq_steps": N // micro,
                "best_ms": round(best * 1e3, 2), "median_ms": round(med * 1e3, 2),
                "tflops_at_best": round(flops_pair / best / 1e12, 2),
                "check": round(out, 2),
            }), flush=True)
        return

    # one fused value+grad program at fixed hypers, default vs block path
    from gpsat_tpu.ops.fused_lml import masked_gpr_lml_fused

    D = 2
    X = jnp.asarray(rng.uniform(-6, 6, (B, N, D)).astype(np.float32))
    y = jnp.asarray((np.sin(np.asarray(X)[..., 0]) + 0.1 * rng.standard_normal((B, N))).astype(np.float32))
    m = jnp.ones((B, N), jnp.float32)
    ls = jnp.asarray(np.full((B, D), 1.3, np.float32))
    kv = jnp.full((B,), 0.9, jnp.float32)
    lv = jnp.full((B,), 0.05, jnp.float32)

    def f(X, y, m, ls, kv, lv):
        return masked_gpr_lml_fused("Matern32", X, y, m, ls, kv, lv, 1e-5)

    def make_vg():
        vg = jax.vmap(jax.value_and_grad(f, argnums=(3, 4, 5)), in_axes=(0,) * 6)

        @jax.jit
        def run(X):
            val, grads = vg(X, y, m, ls, kv, lv)
            return jnp.sum(val) + sum(jnp.sum(g) for g in grads)

        return run

    for name, env in [("vg_default", "0"), ("vg_block", "1"), ("vg_recursive", "rec")]:
        if env == "rec":
            os.environ["GPSAT_BLOCK_CHOL"] = "0"
            os.environ["GPSAT_RECURSIVE_CHOL"] = "1"
            if not LA.recursive_path_enabled(Kd[0]):
                print(json.dumps({"metric": f"factor_{name}", "error": "recursive path gate disabled on this backend"}), flush=True)
                continue
        else:
            os.environ["GPSAT_RECURSIVE_CHOL"] = "0"
            os.environ["GPSAT_BLOCK_CHOL"] = env
        if env == "1" and not LA.block_path_enabled(Kd[0]):
            # a disabled gate would silently re-time the default path
            # under the block label — refuse to emit a mislabeled number
            print(json.dumps({"metric": f"factor_{name}", "error": "block path gate disabled on this backend"}), flush=True)
            continue
        jax.clear_caches()
        try:
            best, med, out = _time(make_vg(), X, reps)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"factor_{name}", "error": repr(e)[:300]}), flush=True)
            continue
        print(json.dumps({
            "metric": f"factor_{name}", "B": B, "N": N,
            "best_ms": round(best * 1e3, 2), "median_ms": round(med * 1e3, 2),
            "check": round(out, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
