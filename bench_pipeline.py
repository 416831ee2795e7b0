"""North-star benchmark: pan-Arctic-geometry OI through the FULL orchestrator.

Reproduces the reference's canonical workload geometry (BASELINE.md):
±4,500 km EASE2 domain binned at 50 km (181x181 cells, ~55% ocean-like
occupancy), experts on a 200 km grid (~1.4-1.5k with data of ~2k total),
300 km training radius, 200 km inference radius, prediction grid at 25 km.
Everything runs through LocalExpertOI — host tile assembly, bucketed
mesh-sharded execution, results store — i.e. the pipeline a user actually
runs, not a kernel microbench.

Target (BASELINE.md north star): ~3k experts end-to-end < 60 s on a v5p-8.
This measures one chip; the expert axis is embarrassingly parallel so
multi-chip scales ~linearly (validated functionally via dryrun_multichip).

Prints ONE JSON line like bench.py.
"""

import json
import os
import tempfile
import time

import numpy as np
import pandas as pd


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    from gpsat_tpu import enable_compilation_cache

    enable_compilation_cache()

    from gpsat_tpu.local_expert_oi import run_from_config
    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.utils import grid_2d_flatten

    # GPSAT_BENCH_SCALE < 1 shrinks the domain for smoke runs
    scale = float(os.environ.get("GPSAT_BENCH_SCALE", "1.0"))
    extent = 4_500_000.0 * scale
    grid_res = 50_000.0
    rng = np.random.default_rng(0)

    # binned field on the 181x181 lattice with patchy occupancy
    cells = grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=grid_res)
    occupancy = (
        np.sin(cells[:, 0] / 1.1e6) * np.cos(cells[:, 1] / 1.4e6)
        + 0.6 * rng.standard_normal(len(cells)) * 0
        + rng.uniform(0, 1, len(cells))
    ) > 0.45
    cells = cells[occupancy]
    z = (
        0.3 * np.sin(cells[:, 0] / 8e5) * np.cos(cells[:, 1] / 6e5)
        + 0.2 * np.sin((cells[:, 0] + cells[:, 1]) / 1.5e6)
        + 0.05 * rng.standard_normal(len(cells))
    )
    obs = pd.DataFrame({"x": cells[:, 0], "y": cells[:, 1], "z": z})

    # experts on a 200 km grid, keep those with data nearby
    el = grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=200_000.0)
    experts = pd.DataFrame({"x": el[:, 0], "y": el[:, 1]})

    # prediction grid at 25 km, filtered per expert by 200 km radius
    pg = grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=25_000.0)
    pred_df = pd.DataFrame({"x": pg[:, 0], "y": pg[:, 1]})

    store_path = os.path.join(tempfile.mkdtemp(prefix="gpsat_bench_"), "results.h5")
    cfg = {
        "locations": {"source": experts},
        "data": {
            "data_source": obs,
            "obs_col": "z",
            "coords_col": ["x", "y"],
            "local_select": [{"col": ["x", "y"], "comp": "<", "val": 300_000.0}],
        },
        "model": {
            "oi_model": "GPflowGPRModel",
            "init_params": {
                "coords_scale": [50_000, 50_000],
                "obs_mean": "local",
                "noise_variance": 0.0025,
                "smart_init": True,
                "jitter": 1e-5,
            },
            "constraints": {"lengthscales": {"low": 5_000, "high": 2_000_000}},
            # no linesearch override: the engine's dtype-aware default picks
            # single_eval on f32/TPU (zoom on f64/CPU) out of the box.
            # GPSAT_TWO_STAGE=<K> switches on unconverged-lane compaction
            # (this workload's iteration profile is mean 21 / max 76 — a
            # long tail that otherwise bills the full 1664-expert width)
            # GPSAT_CARRY=<K> switches on state-carrying compaction instead
            # (bit-exact restart that keeps L-BFGS history; kernel-bench
            # slower, pipeline profile untested — this knob is the A/B)
            "optim_kwargs": {
                "max_iter": 100,
                **({"two_stage_iters": int(os.environ["GPSAT_TWO_STAGE"])}
                   if os.environ.get("GPSAT_TWO_STAGE") else {}),
                **({"carry_iters": int(os.environ["GPSAT_CARRY"])}
                   if os.environ.get("GPSAT_CARRY") else {}),
            },
        },
        "pred_loc": {"method": "from_dataframe", "df": pred_df, "max_dist": 200_000.0},
        # pad_multiple=128: the recurring fixed-size bucket (1664 experts)
        # pads to 1664 instead of the 2048 pow2 default — every dead lane
        # costs full compute in the vmap lockstep (19% here)
        "run_kwargs": {"store_path": store_path, "min_obs": 10, "pad_multiple": 128},
    }

    t0 = time.perf_counter()
    run_from_config(cfg)
    elapsed = time.perf_counter() - t0

    # host/device split (VERDICT r3 item 1): host-attributable phase time
    # vs time blocked on device results (device execute + relay link —
    # inseparable through the tunnel). Phases overlap the device under the
    # one-deep async bucket pipeline, so host_s + device_fetch_s need not
    # equal wall; the residual is Python glue + dispatch.
    from gpsat_tpu.experts import get_phase_timers

    raw = get_phase_timers()
    run_wall = raw.pop("run_wall", elapsed)
    phases = {k: round(v, 2) for k, v in sorted(raw.items())}
    host_s = round(sum(v for k, v in phases.items() if k.startswith("host_") or k == "polish"), 2)
    # residual = orchestrator wall not inside any instrumented phase
    # (pure-Python glue between phases; should be small once dispatch,
    # fetch, and all host phases are timed)
    unattributed_s = round(max(0.0, run_wall - sum(raw.values())), 2)

    with TableStore(store_path, mode="r") as ts:
        rd = ts.select("run_details", set_index=False)
        n_preds = len(ts.select("preds", columns=["f*"], set_index=False))
    n_run = int((rd["num_obs"] >= 10).sum())
    conv = int(rd["optimise_success"].sum())
    stall_exits = int(rd["stalled"].sum()) if "stalled" in rd else 0
    eps = n_run / elapsed
    import sys
    print(f"iters mean/max: {rd['num_iter'].mean():.0f}/{rd['num_iter'].max()}", file=sys.stderr)

    out = {
        "metric": "pan_arctic_oi_experts_per_sec_e2e",
        "value": round(eps, 2),
        "unit": (
            f"experts/s through the full pipeline ({n_run} experts, {conv} converged, "
            f"{n_preds} predictions, wall {elapsed:.1f}s incl. compile + IO)"
        ),
        "vs_baseline": round(eps / 1.0, 2),
        "host_s": host_s,
        "device_fetch_s": phases.get("device_fetch", 0.0),
        "device_dispatch_s": phases.get("device_dispatch", 0.0),
        "unattributed_s": unattributed_s,
        "run_wall_s": round(run_wall, 1),
        "phases_s": phases,
        "stall_exits": stall_exits,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
