"""Weak-scaling evidence on a virtual device mesh (SURVEY.md §2.9).

Real multi-chip hardware is unavailable in this environment; this script
provides the honest substitute: a virtual n-device CPU mesh (the same
XLA_FLAGS mechanism the driver's dryrun uses) running the sharded engine
at FIXED experts-per-device, reporting experts/s per device. Experts are
embarrassingly parallel (no collectives inside optimization), so per-device
throughput should stay constant as devices grow — any drop is sharding
overhead, not algorithm.

On CPU the devices share physical cores, so absolute numbers undersell a
real TPU pod; the shape of the curve (flat per-device throughput) is the
signal. Run on real multi-chip hardware unchanged: the mesh construction
is identical (docs/multihost.md).

Usage: python bench_scaling.py [--devices 1,2,4,8] [--per-device 16]
Prints one JSON line per mesh size.
"""

import argparse
import json
import os
import sys
import time


def _ensure_devices(n: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n, "re-run in a fresh process"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per-device", type=int, default=16)
    ap.add_argument("-N", type=int, default=256)
    ap.add_argument("-P", type=int, default=16)
    args = ap.parse_args()

    sizes = [int(s) for s in args.devices.split(",")]
    _ensure_devices(max(sizes))

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from bench_models import make_batch
    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

    core = make_gpr_core(jitter=0.0)
    results = []
    for n in sizes:
        B = args.per_device * n
        mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("experts",))
        runner = make_batched_runner(core, max_iter=150, mesh=mesh)
        batch = make_batch(B, args.N, args.P, 2, np.float64)
        run_tile_batch(batch, {"smart_init": True}, runner, core, mesh=mesh)  # compile
        t0 = time.perf_counter()
        res = run_tile_batch(batch, {"smart_init": True}, runner, core, mesh=mesh)
        dt = time.perf_counter() - t0
        row = {
            "devices": n,
            "experts": B,
            "experts_per_sec": round(B / dt, 1),
            "experts_per_sec_per_device": round(B / dt / n, 1),
            "converged": f"{int(np.asarray(res['converged']).sum())}/{B}",
            "seconds": round(dt, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # All n virtual devices share os.cpu_count() physical cores, so the
    # honest signal here is sharding OVERHEAD, not parallel speedup: with
    # weak-scaled work, total throughput should not DROP as the expert axis
    # is split over more shards. (On real multi-chip hardware the same
    # script shows per-device throughput flat instead.)
    base = results[0]["experts_per_sec"]
    worst = min(r["experts_per_sec"] for r in results)
    print(json.dumps({
        "metric": "sharding_overhead_total_throughput_ratio",
        "value": round(worst / base, 3),
        "physical_cores": os.cpu_count(),
        "note": ">=1.0 means splitting the expert axis over more shards costs nothing; "
                f"parallel speedup requires >= {max(sizes)} physical cores/chips",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
