"""Generate + execute examples/sea_ice_freeboard_demo.ipynb.

The TPU-rebuild analogue of the reference's full-scale flagship
(ref: examples/sea_ice_freeboard/demo.ipynb) — daily radar-freeboard
interpolation over the full pan-Arctic EASE2 geometry (±4,500 km at 50 km
= 181x181 cells), 4 pseudo-satellites x 9 days of track observations,
a sea-ice-extent mask, x/y/t local experts, hyperparameter-field
clip+smooth, re-prediction, and gluing. Real CPOM freeboard pickles are
not shipped, so stage 0 synthesises observations at realistic track
geometry from a known truth field (SURVEY.md §2.8) — which also lets the
final panel measure recovery error.

Scale knob: GPSAT_DEMO_SCALE (default 1.0 = full geometry; CI smoke uses
~0.2). Execute on a TPU host for the full-scale artifact — on CPU set
GPSAT_DEMO_CPU=1 (forces cpu platform + f64) and a smaller scale.

Run: python tools/make_seaice_demo.py [--no-execute] [--timeout SECS]
"""

import argparse
import json
import os
import sys

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    ("markdown", """\
# Sea-ice freeboard: the full-scale pan-Arctic workflow

The flagship end-to-end workload (the TPU-native equivalent of the
reference's `examples/sea_ice_freeboard/demo.ipynb`): interpolate daily
radar freeboard over the **full EASE2 pan-Arctic domain** — ±4,500 km at
50 km resolution (181×181 cells) — from multi-satellite track
observations, with local experts in **x, y and time**.

| stage | reference demo | here |
|---|---|---|
| inputs | CS2 SAR / CS2 SARIN / S3A / S3B daily 50 km freeboard pickles | 4 pseudo-satellites sampled from a known truth field on realistic tracks |
| ice mask | SIE 50 km mask | synthetic extent mask, same occupancy |
| model | GPflow GPR, Matérn-3/2, lengthscales (x, y, t) | exact GPR (batched JAX engine), Matérn-3/2, lengthscales (x, y, t) |
| training window | T = 9 days, interpolate the central day | same |
| postprocess | `clip_and_smooth` hyperparameter fields, re-predict | `smooth_hyperparameters` (clip min/max + Gaussian smooth) → predict-only second pass |
| output | gridded mean/variance + hyperparameter maps | same, **plus** recovery error vs the known truth |

Because the observations are synthetic, the last panel can measure what
the reference demo cannot: how close the glued posterior mean lands to
the *actual* field.

On a TPU host this notebook runs the production f32 path — experts
bucketed, padded and executed as a handful of jitted XLA programs
(hundreds of experts per device step). `GPSAT_DEMO_CPU=1` forces the
CPU/f64 reference-parity path instead (use a reduced `GPSAT_DEMO_SCALE`)."""),
    ("code", """\
import os, tempfile, json, time
SCALE = float(os.environ.get("GPSAT_DEMO_SCALE", "1.0"))
import jax
if os.environ.get("GPSAT_DEMO_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")  # GP-grade matmuls
import gpsat_tpu
if os.environ.get("GPSAT_DEMO_CPU"):
    gpsat_tpu.enable_x64()          # CPU = f64 reference-parity mode

import numpy as np
import pandas as pd
%matplotlib inline
import matplotlib.pyplot as plt

print("backend:", jax.devices()[0].platform, "| scale:", SCALE)
work = tempfile.mkdtemp(prefix="gpsat_seaice_")"""),
    ("markdown", """\
## Stage 0 — geometry, truth field, sea-ice extent

The reference demo loads `new_x_50km.npy` / `new_y_50km.npy` (the EASE2
50 km lattice) and an SIE mask pickle. Here: the same ±4,500 km / 50 km
lattice, a synthetic freeboard truth field (smooth base + slow daily
drift, ~0.1–0.4 m), and a noisy-edged radial extent mask at ~45%
occupancy. T = 9 days of data; the model interpolates the central day
(`t = 4`), exactly like the reference's `T`, `T_mid`."""),
    ("code", """\
from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth
from gpsat_tpu.synthetic import interp_2d

EXTENT, GRID_RES = 4_500_000.0 * SCALE, 50_000.0
T = int(os.environ.get("GPSAT_DEMO_DAYS", "9"))   # CI smoke shrinks the window
T_MID = T // 2
ncell = int(round(2 * EXTENT / GRID_RES)) + 1
base, xg, yg = make_ground_truth_field(extent=EXTENT, n=ncell, seed=3)
trend, _, _ = make_ground_truth_field(extent=EXTENT, n=ncell, seed=11)

def freeboard(day):            # metres; slow drift over the 9-day window
    return 0.25 + 0.12 * base + 0.015 * (day - T_MID) * trend

# sea-ice extent: radial mask with a noisy boundary + a few open-water holes
XX, YY = np.meshgrid(xg, yg)
rr = np.hypot(XX, YY)
theta = np.arctan2(YY, XX)
rng = np.random.default_rng(0)
edge = 1.0 + 0.18 * np.sin(3 * theta + 0.7) + 0.1 * np.sin(7 * theta)
sie = (rr < 0.72 * EXTENT * edge) & (rng.uniform(size=rr.shape) > 0.03)
print(f"grid {ncell}x{ncell} at 50 km | ice cells: {int(sie.sum())} ({sie.mean():.0%} occupancy)")"""),
    ("markdown", """\
## Stage 1 — multi-satellite track observations

Four pseudo-satellites (the CS2 SAR / CS2 SARIN / S3A / S3B stand-ins)
each fly straight-arc tracks across the domain every day; every track
point inside the ice edge samples the (drifting) truth with per-mission
noise. This is the shape the CPOM daily-gridded deliveries come from."""),
    ("code", """\
SATS = {"CS2_SAR": 0.10, "CS2_SARIN": 0.12, "S3A": 0.08, "S3B": 0.08}   # noise std (m)
n_tracks = max(3, int(round(10 * SCALE)))
raw = []
for si, (sat, noise) in enumerate(SATS.items()):
    for day in range(T):
        tracks = make_tracks(extent=EXTENT, n_tracks=n_tracks,
                             pts_per_track=1200, seed=1000 * si + day)
        obs = sample_from_ground_truth(tracks, freeboard(day), xg, yg,
                                       noise_std=noise, obs_col="z", seed=si * 77 + day)
        on_ice = interp_2d(sie.astype(float), xg, yg, obs["x"].values, obs["y"].values) > 0.5
        obs = obs[on_ice].copy()
        obs["t"], obs["sat"] = float(day), sat
        raw.append(obs)
raw = pd.concat(raw, ignore_index=True)
print(f"{len(raw):,} raw track observations over {T} days x {len(SATS)} satellites")"""),
    ("markdown", """\
## Stage 2 — bin to daily 50 km fields

Per-cell daily means per satellite on the fixed lattice — the exact
product the reference demo *starts* from (its pickles are daily 50 km
grids). `by_cols=["t", "sat"]` keeps days and missions separate
(ref: GPSat/bin_data.py:574-699 conventions)."""),
    ("code", """\
from gpsat_tpu.data.binning import BinData

binned_file = os.path.join(work, "binned.h5")
df_bin, _ = BinData().bin_data(
    input={"source": raw},
    bin_config={
        "by_cols": ["t", "sat"], "val_col": "z",
        "x_col": "x", "y_col": "y", "grid_res": GRID_RES,
        "x_range": [-EXTENT, EXTENT], "y_range": [-EXTENT, EXTENT],
    },
    output={"file": binned_file, "table": "data"},
)
print(f"{len(raw):,} raw obs -> {len(df_bin):,} daily-gridded cells "
      f"({len(df_bin)/T/len(SATS):,.0f} cells/day/satellite)")

fig, ax = plt.subplots(figsize=(6.5, 6))
ax.pcolormesh(xg, yg, np.where(sie, freeboard(T_MID), np.nan), shading="nearest")
d0 = df_bin[(df_bin["t"] == T_MID) & (df_bin["sat"] == "CS2_SAR")]
ax.scatter(d0["x"], d0["y"], s=1.5, c="k", alpha=0.6)
ax.set_title(f"truth (day {T_MID}) + CS2_SAR daily coverage")
fig.tight_layout()"""),
    ("markdown", """\
## Stage 3 — local-expert OI in x, y, t

Experts on a 200 km grid over the ice, at `t = 4` (the central day). Each
selects binned obs within **300 km and ±4 days** of itself, optimises a
Matérn-3/2 GPR with separate x/y/t lengthscales (the reference's
`init_hyperparameters`), and predicts the central day on the 50 km cells
within **200 km** (ref: demo.ipynb cell 3; local_experts.py:761-1279).

On TPU the sweep runs as bucketed vmap programs — the same config a CPU
host executes serially."""),
    ("code", """\
from gpsat_tpu.local_expert_oi import run_from_config
from gpsat_tpu.experts import get_results_from_h5file

step = int(200_000 // GRID_RES)                       # experts every 200 km
eix = np.arange(ncell)[2::step]
ex_x, ex_y = np.meshgrid(xg[eix], yg[eix])
on_ice = sie[np.ix_(eix, eix)]
experts = pd.DataFrame({"x": ex_x[on_ice], "y": ex_y[on_ice], "t": float(T_MID)})

ice_x, ice_y = XX[sie], YY[sie]                        # predict every ice cell
pred_df = pd.DataFrame({"x": ice_x, "y": ice_y, "t": float(T_MID)})

store_path = os.path.join(work, "results.h5")
oi_config = {
    "locations": {"source": experts},
    "data": {
        "data_source": binned_file,
        "table": "data",
        "obs_col": "z",
        "coords_col": ["x", "y", "t"],
        "local_select": [
            {"col": ["x", "y"], "comp": "<", "val": 300_000.0},
            {"col": "t", "comp": "<=", "val": 4.0},
            {"col": "t", "comp": ">=", "val": -4.0},
        ],
    },
    "model": {
        "oi_model": "GPflowGPRModel",
        "init_params": {
            "kernel": "Matern32",
            "coords_scale": [50_000, 50_000, 1],       # -> lengthscales in cells / days
            "obs_mean": "local",
            "smart_init": True,
            "jitter": 1e-5,
        },
        # the reference demo's postprocess_kwargs vmin/vmax, raw units
        # (m, m, days) — the engine rescales x/y by coords_scale
        "constraints": {"lengthscales": {"low": [1.0, 1.0, 0.1], "high": [600_000.0, 600_000.0, 9.0]}},
        "optim_kwargs": {"max_iter": 100},
    },
    "pred_loc": {"method": "from_dataframe", "df": pred_df, "max_dist": 200_000.0},
    "run_kwargs": {"store_path": store_path, "min_obs": 10, "pad_multiple": 128},
}
t0 = time.time()
run_from_config(oi_config)
print(f"OI sweep: {time.time() - t0:.1f} s wall ({len(experts)} expert locations)")"""),
    ("code", """\
dfs, stored_configs = get_results_from_h5file(store_path)
rd = dfs["run_details"]
ran = rd[rd["num_obs"] >= 10]
print(f"experts run: {len(ran)} | converged: {int(ran['optimise_success'].sum())} "
      f"| obs/expert mean {ran['num_obs'].mean():.0f} max {int(ran['num_obs'].max())} "
      f"| iters mean {ran['num_iter'].mean():.1f}")
print(f"prediction rows: {len(dfs['preds']):,}")"""),
    ("markdown", """\
## Hyperparameter fields

The per-expert optimised hyperparameters as maps over the expert grid —
the reference demo's final panel (`lengthscale_x/y/t`, `kernel_variance`,
`observation_variance`; demo.ipynb cell 5). Lengthscales are in scaled
units: grid cells (50 km) for x/y, days for t."""),
    ("code", """\
ls = dfs["lengthscales"].reset_index()
kv = dfs["kernel_variance"].reset_index()
lv = dfs["likelihood_variance"].reset_index()

def field(df, val):
    return df.pivot(index="y", columns="x", values=val)

panels = [(field(ls[ls["_dim_0"] == 0], "lengthscales"), "lengthscale x (cells)"),
          (field(ls[ls["_dim_0"] == 1], "lengthscales"), "lengthscale y (cells)"),
          (field(ls[ls["_dim_0"] == 2], "lengthscales"), "lengthscale t (days)"),
          (field(kv, "kernel_variance"), "kernel variance"),
          (field(lv, "likelihood_variance"), "observation variance")]
fig, axs = plt.subplots(2, 3, figsize=(15, 8))
for ax, (g, title) in zip(axs.ravel(), panels):
    im = ax.pcolormesh(g.columns.values, g.index.values, g.values, shading="nearest")
    ax.set_title(title); fig.colorbar(im, ax=ax)
axs[1, 2].set_axis_off()
fig.tight_layout()"""),
    ("markdown", """\
## Stage 4 — clip + smooth the hyperparameter fields, re-predict

Independently-fit experts give noisy hyperparameter maps. The reference
demo regularises them with `clip_and_smooth` and re-predicts; here
`smooth_hyperparameters` does the same two-phase dance — clip to
[min, max], Gaussian-smooth over the expert grid, write `*_SMOOTHED`
tables, then a **predict-only** second sweep loads the smoothed values
(ref: GPSat/postprocessing.py:96-380)."""),
    ("code", """\
from gpsat_tpu.postprocess import SmoothingConfig, smooth_hyperparameters

l_smooth = 200_000.0                                   # one expert spacing
cfg_path = smooth_hyperparameters(
    result_file=store_path,
    params_to_smooth=["lengthscales", "kernel_variance", "likelihood_variance"],
    smooth_config_dict={
        "lengthscales": SmoothingConfig(l_x=l_smooth, l_y=l_smooth, min=0.02, max=12.0),
        "kernel_variance": SmoothingConfig(l_x=l_smooth, l_y=l_smooth, min=2e-6, max=0.1),
        "likelihood_variance": SmoothingConfig(l_x=l_smooth, l_y=l_smooth, min=2e-6, max=0.05),
    },
)
emitted = json.load(open(cfg_path))[-1]
predict_only = {
    **oi_config,
    "model": {**oi_config["model"], "load_params": emitted["model"]["load_params"]},
    "run_kwargs": {
        "store_path": store_path, "optimise": False, "table_suffix": "_SMOOTHED",
        "skip_valid_checks_on": ["model", "run_kwargs"],
        "min_obs": 10, "pad_multiple": 128,
    },
}
t0 = time.time()
run_from_config(predict_only)
print(f"re-predict with smoothed fields: {time.time() - t0:.1f} s wall")"""),
    ("markdown", """\
## Stage 5 — glue overlapping experts → the gridded product

Neighbouring experts predict the same 50 km cells; Gaussian distance
weights blend them (σ = radius/3; ref: postprocessing.py:447-577). The
result is the reference demo's `gridded_mean` / `gridded_var` panel —
plus the one it can't draw: error against the known truth."""),
    ("code", """\
from gpsat_tpu.postprocess import glue_local_predictions

dfs_sm, _ = get_results_from_h5file(store_path, table_suffix="_SMOOTHED")
preds = dfs_sm["preds_SMOOTHED"]
# f* is the de-meaned posterior (reference schema: gpflow_models.py:236-271
# stores f* and the subtracted per-expert mean f_bar separately) — glue
# both and re-add, as in examples/inline_example.py
glued = glue_local_predictions(preds, inference_radius=200_000.0,
                               vars_to_glue=["f*", "f*_var", "y_var", "f_bar"])
glued["f*"] = glued["f*"] + glued["f_bar"]

# join on grid indices (float-exact regardless of storage dtype)
def cell_ix(v, grid0):
    return np.round((np.asarray(v, dtype=float) - grid0) / GRID_RES).astype(int)

glued = glued.assign(ix=cell_ix(glued["pred_loc_x"], xg[0]),
                     iy=cell_ix(glued["pred_loc_y"], yg[0]))
truth_df = pd.DataFrame({"ix": cell_ix(XX[sie], xg[0]), "iy": cell_ix(YY[sie], yg[0]),
                         "truth": freeboard(T_MID)[sie]})
merged = glued.merge(truth_df, on=["ix", "iy"], how="inner")
rmse = float(np.sqrt(np.mean((merged["f*"] - merged["truth"]) ** 2)))
mad = float(np.abs(merged["f*"] - merged["truth"]).max())
noise_floor = min(SATS.values())
print(f"glued cells: {len(merged):,} | RMSE vs truth {rmse * 100:.2f} cm "
      f"(best single-obs noise {noise_floor * 100:.0f} cm) | max abs {mad * 100:.1f} cm")
assert rmse < noise_floor, "posterior mean should beat the observation noise floor"

def cellgrid(df, val):
    g = np.full((ncell, ncell), np.nan)
    g[df["iy"].values, df["ix"].values] = df[val].values
    return g

fig, axs = plt.subplots(1, 3, figsize=(17, 5))
tg = np.where(sie, freeboard(T_MID), np.nan)
mg = cellgrid(merged, "f*")
sg = np.sqrt(cellgrid(merged, "f*_var"))
vmin, vmax = np.nanmin(tg), np.nanmax(tg)
for ax, g, title, kw in [
    (axs[0], tg, "truth (day 4)", dict(vmin=vmin, vmax=vmax)),
    (axs[1], mg, "glued posterior mean", dict(vmin=vmin, vmax=vmax)),
    (axs[2], sg, "posterior std", {}),
]:
    im = ax.pcolormesh(xg, yg, g, shading="nearest", **kw)
    ax.set_title(title); fig.colorbar(im, ax=ax)
fig.tight_layout()"""),
    ("markdown", """\
## Notes

- **Configs**: the dicts above ship as `configs/sea_ice_freeboard_oi.json`
  and `configs/sea_ice_freeboard_postprocessing.json` (file-path driven —
  point them at a real binned store) for the JSON CLIs:
  `python -m gpsat_tpu.local_expert_oi` / `... .postprocessing`.
- **Accuracy**: the TPU f32 production path leaves ~1e-2-level raw
  hyperparameter noise that the smoothing stage absorbs (measured:
  `bench_smooth_sensitivity.py`); for reference-parity hyperparameter
  *fields* add `"optim_kwargs": {"polish": "f64"}`.
- **Scale-out**: the same config runs multi-host with
  `python -m gpsat_tpu.distributed` (docs/multihost.md); single-chip
  steady-state for this geometry is benchmarked in `bench_pipeline.py`
  (BENCH_PIPELINE_r04.json)."""),
]


def build():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3", "language": "python"}
    for kind, src in CELLS:
        nb.cells.append(nbf.v4.new_markdown_cell(src) if kind == "markdown" else nbf.v4.new_code_cell(src))
    return nb


def write_configs():
    """The same run, file-driven, for the JSON CLIs."""
    oi = {
        "comment": (
            "Full-scale sea-ice-freeboard analogue (ref: examples/sea_ice_freeboard/"
            "demo.ipynb): x/y/t local experts over the pan-Arctic EASE2 50 km grid. "
            "Point data_source at a binned daily store (see examples/"
            "sea_ice_freeboard_demo.ipynb stage 2) and locations/pred_loc at "
            "expert/prediction location tables."
        ),
        "locations": {"source": "/path/to/experts.csv"},
        "data": {
            "data_source": "/path/to/binned.h5",
            "table": "data",
            "obs_col": "z",
            "coords_col": ["x", "y", "t"],
            "local_select": [
                {"col": ["x", "y"], "comp": "<", "val": 300000.0},
                {"col": "t", "comp": "<=", "val": 4.0},
                {"col": "t", "comp": ">=", "val": -4.0},
            ],
        },
        "model": {
            "oi_model": "GPflowGPRModel",
            "init_params": {
                "kernel": "Matern32",
                "coords_scale": [50000, 50000, 1],
                "obs_mean": "local",
                "smart_init": True,
                "jitter": 1e-5,
            },
            "constraints": {"lengthscales": {"low": [1.0, 1.0, 0.1], "high": [600000.0, 600000.0, 9.0]}},
            "optim_kwargs": {"max_iter": 100},
        },
        "pred_loc": {"method": "from_dataframe", "df_file": "/path/to/pred_locs.csv", "max_dist": 200000.0},
        "run_kwargs": {"store_path": "/path/to/results.h5", "min_obs": 10, "pad_multiple": 128},
    }
    post = {
        "comment": (
            "Clip+smooth the sea-ice hyperparameter fields and emit the predict-only "
            "re-run config (ref: GPSat/postprocessing.py:96-380, demo.ipynb "
            "postprocess_kwargs). Smoothing clip bounds are in SCALED units "
            "(50 km cells / days) — they clip the stored cparams."
        ),
        "result_file": "/path/to/results.h5",
        "params_to_smooth": ["lengthscales", "kernel_variance", "likelihood_variance"],
        "smooth_config_dict": {
            "lengthscales": {"l_x": 200000.0, "l_y": 200000.0, "min": 0.02, "max": 12.0},
            "kernel_variance": {"l_x": 200000.0, "l_y": 200000.0, "min": 2e-6, "max": 0.1},
            "likelihood_variance": {"l_x": 200000.0, "l_y": 200000.0, "min": 2e-6, "max": 0.05},
        },
        "table_suffix": "_SMOOTHED",
    }
    for name, cfg in [("sea_ice_freeboard_oi.json", oi), ("sea_ice_freeboard_postprocessing.json", post)]:
        path = os.path.join(REPO, "configs", name)
        with open(path, "w") as fh:
            json.dump(cfg, fh, indent=2)
        print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-execute", action="store_true")
    ap.add_argument("--timeout", type=int, default=5400)
    args = ap.parse_args()

    write_configs()
    nb = build()
    if not args.no_execute:
        from nbclient import NotebookClient

        NotebookClient(
            nb, timeout=args.timeout, kernel_name="python3",
            resources={"metadata": {"path": REPO}},
        ).execute()
    out = os.path.join(REPO, "examples", "sea_ice_freeboard_demo.ipynb")
    with open(out, "w") as fh:
        nbf.write(nb, fh)
    print(f"wrote {out} ({'executed' if not args.no_execute else 'unexecuted'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
