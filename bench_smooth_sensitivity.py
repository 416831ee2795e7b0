"""Sensitivity of the smoothed-hyperparameter workflow to f32 hyper error.

The two-phase workflow (ref: GPSat/postprocessing.py:96-380) stores
per-expert hyperparameter FIELDS, kernel-smooths them over the expert
grid, and re-predicts with the smoothed values. The f32 production path
carries ~15% max-relative error on individual hyperparameters (flat
optimum; predictions are fine — ACCURACY log), so the open question
(VERDICT r3 weak #4) is whether that error survives smoothing and
contaminates the re-predictions a user actually consumes.

Design: E experts on a grid over a synthetic ground-truth field.
  1. optimize all experts in f64 (gold: zoom, tight tols) and in f32
     (production: single_eval, jitter 1e-5, loose tols), plus the shipped
     f64-polish tail on the f32 optima;
  2. smooth each hyperparameter field with the production smoothing
     kernel (postprocess.gaussian_2d_weight, l = 2 expert spacings);
  3. re-predict every expert in IDENTICAL f64 arithmetic from each
     smoothed field (engine polish path with a zero-iteration budget) —
     differences are then attributable to the hyper fields alone.

Prints JSON lines: raw-field error, smoothed-field error, and
re-prediction deltas for f32-vs-f64 and polish-vs-f64 lanes.

CPU-only by design: f32-on-CPU reproduces the flat-optimum hyper error
(it is algorithmic, not hardware rounding of the backend), and identical
f64 re-prediction arithmetic needs the CPU backend anyway.

Usage: python bench_smooth_sensitivity.py [--grid 12] [-N 384]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=12, help="experts per side")
    ap.add_argument("-N", type=int, default=384, help="padded obs per tile")
    ap.add_argument("--polish-iters", type=int, default=150)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.parallel import batching
    from gpsat_tpu.parallel.engine import (
        make_batched_runner,
        polish_tile_batch,
        run_tile_batch,
    )
    from gpsat_tpu.postprocess import gaussian_2d_weight
    from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth

    # --- synthetic obs on tracks over a smooth field (§2.8 machinery) ---
    extent = 500_000.0
    field, xg, yg = make_ground_truth_field(extent=extent, n=121, seed=0)
    tracks = make_tracks(extent=extent, n_tracks=60, pts_per_track=400, seed=1)
    obs_df = sample_from_ground_truth(tracks, field, xg, yg, noise_std=0.05)

    # --- expert grid + radius tiles ---
    G = args.grid
    spacing = 2 * extent / (G + 1)
    gx = np.linspace(-extent + spacing, extent - spacing, G)
    ex, ey = np.meshgrid(gx, gx, indexing="xy")
    expert_locs = np.stack([ex.ravel(), ey.ravel()], axis=1)
    coords = obs_df[["x", "y"]].to_numpy()
    obs = obs_df["obs"].to_numpy()
    radius = 1.5 * spacing

    rng = np.random.default_rng(2)
    tile_ix, pred = [], []
    keep = []
    for i, (cx, cy) in enumerate(expert_locs):
        d2 = (coords[:, 0] - cx) ** 2 + (coords[:, 1] - cy) ** 2
        ix = np.where(d2 <= radius**2)[0]
        if len(ix) < 32:
            continue  # min_obs policy
        if len(ix) > args.N:
            ix = rng.choice(ix, args.N, replace=False)
        keep.append(i)
        tile_ix.append(ix)
        # fixed 4x4 prediction stencil around the expert
        off = np.linspace(-spacing / 2, spacing / 2, 4)
        px, py = np.meshgrid(cx + off, cy + off, indexing="xy")
        pred.append(np.stack([px.ravel(), py.ravel()], axis=1))
    expert_locs = expert_locs[keep]
    E = len(keep)
    scale = np.array([50_000.0, 50_000.0])  # reference coords_scale

    tiles64 = batching.assemble_tiles(
        coords, obs, tile_ix, pred, coords_scale=scale, dtype=np.float64,
        max_batch_size=4096,
    )
    assert len(tiles64) >= 1

    core64 = make_gpr_core(jitter=0.0)
    core32 = make_gpr_core(jitter=1e-5)
    gold_runner = make_batched_runner(core64, max_iter=500, linesearch="zoom",
                                      tol_grad=1e-6, tol_f=1e-11)
    f32_runner = make_batched_runner(core32, max_iter=150, linesearch="single_eval",
                                     tol_grad=1e-3, tol_f=1e-6)

    def merge(outs):
        """Concatenate per-bucket results and sort rows by expert_index
        (expert_index is arange(E) here, so the merged arrays are in
        expert order and can be indexed by b.expert_index per bucket)."""
        merged = {}
        for k in outs[0]:
            merged[k] = np.concatenate([np.asarray(o[k]) for o in outs], axis=0)
        order = np.argsort(merged["expert_index"])
        return {k: v[order] for k, v in merged.items()}

    t0 = time.perf_counter()
    gold = merge([run_tile_batch(b, {"smart_init": True}, gold_runner, core64) for b in tiles64])
    t_gold = time.perf_counter() - t0

    tiles32 = [batching.cast_batch(b, np.float32) for b in tiles64]
    t0 = time.perf_counter()
    f32_outs = [run_tile_batch(b, {"smart_init": True}, f32_runner, core32) for b in tiles32]
    f32 = merge(f32_outs)
    t_f32 = time.perf_counter() - t0

    # shipped polish tail (engine defaults: single_eval, CPU, f64) on the
    # per-bucket f32 results
    t0 = time.perf_counter()
    pol = merge([
        polish_tile_batch(b64, raw, core64, max_iter=args.polish_iters)
        for b64, raw in zip(tiles64, f32_outs)
    ])
    t_pol = time.perf_counter() - t0

    params = ["lengthscales", "kernel_variance", "likelihood_variance"]
    xs, ys = expert_locs[:, 0] / scale[0], expert_locs[:, 1] / scale[1]
    l_smooth = 2 * spacing / scale[0]  # 2 expert spacings, the usual choice

    def smooth_fields(lane):
        out = {}
        for p in params:
            v = np.asarray(lane[p], np.float64)
            if v.ndim == 1:
                v = v[:, None]
            out[p] = np.stack(
                [gaussian_2d_weight(xs, ys, xs, ys, l_smooth, l_smooth, v[:, d])
                 for d in range(v.shape[1])], axis=1,
            )
        return out

    sm_gold, sm_f32, sm_pol = smooth_fields(gold), smooth_fields(f32), smooth_fields(pol)

    def field_err(a, b):
        errs = {}
        for p in params:
            den = np.maximum(np.abs(b[p]), 1e-12)
            errs[p] = float(np.max(np.abs(a[p] - b[p]) / den))
        return errs

    raw_err = field_err({p: np.asarray(f32[p], np.float64) for p in params},
                        {p: np.asarray(gold[p], np.float64) for p in params})
    print(json.dumps({"stage": "raw_fields_f32_vs_f64", "max_rel": raw_err}), flush=True)
    print(json.dumps({"stage": "smoothed_fields_f32_vs_f64", "max_rel": field_err(sm_f32, sm_gold)}), flush=True)
    print(json.dumps({"stage": "smoothed_fields_polish_vs_f64", "max_rel": field_err(sm_pol, sm_gold)}), flush=True)

    # --- re-predict from each smoothed field in identical f64 arithmetic ---
    def repredict(smoothed):
        outs = []
        for b64 in tiles64:
            ix = np.asarray(b64.expert_index)  # rows of the expert-ordered fields
            res = {"expert_index": b64.expert_index}
            for p in params:
                v = smoothed[p][ix]
                res[p] = v[:, 0] if np.asarray(gold[p]).ndim == 1 else v
            outs.append(polish_tile_batch(b64, res, core64, max_iter=0))
        return merge(outs)

    rp_gold = repredict(sm_gold)
    rp_f32 = repredict(sm_f32)
    rp_pol = repredict(sm_pol)

    span = float(np.max(rp_gold["f_mean"]) - np.min(rp_gold["f_mean"]))
    for name, rp in [("f32", rp_f32), ("polish", rp_pol)]:
        dmean = np.abs(rp["f_mean"] - rp_gold["f_mean"])
        dvar = np.abs(rp["f_var"] - rp_gold["f_var"])
        print(json.dumps({
            "stage": f"repredict_{name}_vs_f64",
            "max_abs_dmean": float(dmean.max()),
            "rms_dmean": float(np.sqrt((dmean**2).mean())),
            "max_abs_dvar": float(dvar.max()),
            "rel_to_field_span": float(dmean.max() / span),
        }), flush=True)

    print(json.dumps({
        "stage": "summary",
        "experts": E, "N_pad": int(tiles64[0].Nmax),
        "gold_s": round(t_gold, 1), "f32_s": round(t_f32, 1), "polish_s": round(t_pol, 1),
        "smooth_lengthscale_units": "scaled coords (50 km)", "l_smooth": round(l_smooth, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
