"""Compare the gaussian_2d_weight implementations: vectorized numpy/JAX vs
the C++ host kernel (ref: examples/weight_function_compare.py — there a
numba-guvectorize vs astropy-convolution playground; this build's
implementations are gpsat_tpu.postprocess.gaussian_2d_weight (vectorized)
and gpsat_tpu.native.gaussian_2d_weight (threaded C++), plus a plain
python loop as the semantics oracle).

Checks NaN-aware normalized weighted means agree bit-for-tolerance and
prints per-implementation timings.

Usage: python -m examples.weight_function_compare [n_points] [n_targets]
"""

import sys
import time

import numpy as np

# keep the vectorized path on host CPU (no TPU tunnel for a playground)
import jax

jax.config.update("jax_platforms", "cpu")


def naive_loop(x0, y0, x, y, l_x, l_y, vals):
    """Reference semantics (ref: GPSat/postprocessing.py:22-52): per target
    (x0, y0), exp(-d^2/2) weights, NaN vals skipped, normalized; all-NaN
    windows give NaN."""
    out = np.full(len(x0), np.nan)
    for i in range(len(x0)):
        d2 = ((x - x0[i]) / l_x) ** 2 + ((y - y0[i]) / l_y) ** 2
        w = np.exp(-d2 / 2)
        ok = ~np.isnan(vals)
        s = w[ok].sum()
        if s > 0:
            out[i] = (w[ok] * vals[ok]).sum() / s
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 100, n)
    y = rng.uniform(0, 100, n)
    vals = np.sin(x / 10) + np.cos(y / 15) + 0.1 * rng.normal(size=n)
    vals[rng.random(n) < 0.1] = np.nan  # NaN-awareness matters
    x0 = rng.uniform(0, 100, m)
    y0 = rng.uniform(0, 100, m)
    l_x = l_y = 5.0

    from gpsat_tpu.postprocess import gaussian_2d_weight as vec_weight

    t0 = time.perf_counter()
    out_vec = np.asarray(vec_weight(x0, y0, x, y, l_x, l_y, vals))
    t_vec = time.perf_counter() - t0

    from gpsat_tpu import native

    t0 = time.perf_counter()
    out_nat = native.gaussian_2d_weight(x0, y0, x, y, l_x, l_y, vals)
    t_nat = time.perf_counter() - t0
    nat_kind = "C++" if native._lib is not None else "fallback(vectorized)"

    t0 = time.perf_counter()
    out_ref = naive_loop(x0, y0, x, y, l_x, l_y, vals)
    t_ref = time.perf_counter() - t0

    err_vec = np.nanmax(np.abs(out_vec - out_ref))
    err_nat = np.nanmax(np.abs(out_nat - out_ref))
    print(f"n={n} targets={m}")
    print(f"vectorized: {t_vec*1e3:8.1f} ms   max|err| vs loop = {err_vec:.2e}")
    print(f"native[{nat_kind}]: {t_nat*1e3:8.1f} ms   max|err| vs loop = {err_nat:.2e}")
    print(f"python loop: {t_ref*1e3:8.1f} ms (oracle)")
    # the vectorized path runs f32 under JAX's default dtype; the C++ kernel
    # is f64 like the loop
    assert err_vec < 1e-5 and err_nat < 1e-10, "implementations disagree"
    print("all implementations agree")


if __name__ == "__main__":
    main()
