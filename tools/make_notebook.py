"""Generate + execute examples/inline_example.ipynb.

The reference ships executable notebooks (ref: docs/notebooks/,
examples/sea_ice_freeboard/demo.ipynb); this builds the equivalent
flagship notebook for the TPU rebuild — the inline_example.py flow split
into narrated cells — and EXECUTES it (nbclient, CPU/f64) so the checked-in
file carries real outputs.

Run: python tools/make_notebook.py [--no-execute]
"""

import argparse
import os
import sys

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    ("markdown", """\
# Local-expert optimal interpolation, end to end

The flagship workflow (the TPU-native equivalent of the reference's
`inline_example.py` / sea-ice-freeboard demo), self-contained on synthetic
data:

1. **synthetic satellite tracks** over a 1000 km EASE2-like box
2. **bin** onto a 50 km grid
3. **expert grid** at 200 km spacing and a **batched OI sweep** (exact GPR,
   constrained hyperparameters, one jitted XLA program per tile bucket)
4. **smooth** the hyperparameter fields and **re-predict** with them
5. **glue** overlapping expert predictions with Gaussian weights
6. compare against the known truth field

On a machine with a TPU attached the same code runs unchanged — the engine
shards the expert axis over `jax.devices()`. This notebook forces CPU/f64
(reference-parity mode) so it executes anywhere."""),
    ("code", """\
import jax
jax.config.update("jax_platforms", "cpu")   # notebook: run anywhere
import gpsat_tpu
gpsat_tpu.enable_x64()                      # f64 = reference-parity mode

import numpy as np
import pandas as pd
import matplotlib.pyplot as plt

from gpsat_tpu.data.binning import bin_data_by
from gpsat_tpu.experts import LocalExpertOI, get_results_from_h5file
from gpsat_tpu.local_expert_oi import run_from_config
from gpsat_tpu.postprocess import (
    SmoothingConfig, glue_local_predictions_2d, smooth_hyperparameters,
)
from gpsat_tpu.utils import grid_2d_flatten"""),
    ("markdown", """\
## 1. Synthetic observations

Noisy altimeter-like tracks sampling a smooth field — the stand-in for a
binned sea-surface-height product (the reference samples real MSS tracks,
`examples/Archive/sample_from_ground_truth.py`)."""),
    ("code", """\
extent = 500_000.0  # m

def truth_field(x, y):
    return 0.4*np.sin(x/150_000)*np.cos(y/200_000) + 0.2*np.sin((x + y)/300_000)

rng = np.random.default_rng(0)
rows = []
for t in range(16):
    theta = rng.uniform(0, np.pi)
    offset = rng.uniform(-extent, extent)
    s = np.linspace(-1.5*extent, 1.5*extent, 600)
    x = s*np.cos(theta) - offset*np.sin(theta)
    y = s*np.sin(theta) + offset*np.cos(theta)
    keep = (np.abs(x) < extent) & (np.abs(y) < extent)
    x, y = x[keep], y[keep]
    z = truth_field(x, y) + 0.05*rng.normal(size=len(x))
    rows.append(pd.DataFrame({"x": x, "y": y, "z": z, "track": t, "date": "2020-03-05"}))
obs = pd.concat(rows, ignore_index=True)

fig, ax = plt.subplots(figsize=(5, 4.2))
sc = ax.scatter(obs["x"]/1e3, obs["y"]/1e3, c=obs["z"], s=2, cmap="RdBu_r")
ax.set(title=f"raw observations (n={len(obs)})", xlabel="x [km]", ylabel="y [km]", aspect="equal")
fig.colorbar(sc, ax=ax, label="z")
plt.show()"""),
    ("markdown", """\
## 2. Bin onto a 50 km grid

`bin_data_by` reproduces the reference's `DataPrep.bin_data_by`
(scipy `binned_statistic_2d`, identical conventions)."""),
    ("code", """\
df_bin = bin_data_by(
    obs, by_cols="date", val_col="z",
    x_range=[-extent, extent], y_range=[-extent, extent], grid_res=50_000,
).dropna().reset_index()
print(f"binned cells: {len(df_bin)}")
df_bin.head()"""),
    ("markdown", """\
## 3. Batched OI sweep

Config-schema-compatible with the reference (`locations / data / model /
pred_loc / run_kwargs`). Execution is inverted: experts are grouped into
padded tile buckets, each bucket runs as ONE jitted program (vmapped
masked LML + batched L-BFGS + posterior predict), sharded over the device
mesh."""),
    ("code", """\
import os, tempfile
out_dir = tempfile.mkdtemp(prefix="gpsat_tpu_nb_")
store_path = os.path.join(out_dir, "results.h5")

xy = grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=200_000)
experts = pd.DataFrame({"x": xy[:, 0], "y": xy[:, 1]})
pred_grid = grid_2d_flatten([-extent, extent], [-extent, extent], grid_res=25_000)

cfg = {
    "locations": {"source": experts},
    "data": {
        "data_source": df_bin, "obs_col": "z", "coords_col": ["x", "y"],
        "local_select": [{"col": ["x", "y"], "comp": "<", "val": 300_000}],
    },
    "model": {
        "oi_model": "GPflowGPRModel",
        "init_params": {"coords_scale": [50_000, 50_000], "obs_mean": "local",
                        "noise_variance": 0.01},
        "constraints": {"lengthscales": {"low": 10_000, "high": 600_000}},
        "optim_kwargs": {"max_iter": 250},
    },
    "pred_loc": {
        "method": "from_dataframe",
        "df": pd.DataFrame({"x": pred_grid[:, 0], "y": pred_grid[:, 1]}),
        "max_dist": 200_000,
    },
    "run_kwargs": {"store_path": store_path, "min_obs": 5},
}
run_from_config(cfg)"""),
    ("code", """\
dfs, configs = get_results_from_h5file(store_path)
dfs["run_details"][["num_obs", "run_time", "objective_value",
                    "optimise_success", "num_iter"]].head(8)"""),
    ("markdown", """\
## 4. Smooth hyperparameters, re-predict

Two-phase post-processing exactly as the reference
(`postprocessing.smooth_hyperparameters`): Gaussian-kernel smoothing of
each hyperparameter field over the expert grid, then a **predict-only**
second sweep loading the `_SMOOTHED` tables."""),
    ("code", """\
smooth_hyperparameters(
    result_file=store_path,
    params_to_smooth=["lengthscales", "kernel_variance"],
    smooth_config_dict={
        "lengthscales": SmoothingConfig(l_x=200_000, l_y=200_000),
        "kernel_variance": SmoothingConfig(l_x=200_000, l_y=200_000),
    },
    save_config_file=False,
)
cfg2 = {**cfg, "model": {**cfg["model"],
                         "load_params": {"file": store_path, "table_suffix": "_SMOOTHED"}}}
cfg2["run_kwargs"] = {**cfg["run_kwargs"], "optimise": False,
                      "table_suffix": "_SMOOTHED",
                      "skip_valid_checks_on": ["model", "run_kwargs"]}
run_from_config(cfg2)"""),
    ("markdown", """\
## 5. Glue overlapping predictions

Each prediction location is covered by several experts; the glued surface
is their Gaussian-weighted blend (sigma = inference_radius / 3, the
reference's `glue_local_predictions_2d`)."""),
    ("code", """\
dfs, _ = get_results_from_h5file(store_path, table_suffix="_SMOOTHED")
preds = dfs["preds_SMOOTHED"]
glued = glue_local_predictions_2d(
    preds, pred_loc_cols=["pred_loc_x", "pred_loc_y"], xprt_loc_cols=["x", "y"],
    vars_to_glue=["f*", "f*_var", "y_var"], inference_radius=200_000,
)
fbar = preds.groupby(["pred_loc_x", "pred_loc_y"])["f_bar"].mean().reset_index()
glued = glued.merge(fbar, on=["pred_loc_x", "pred_loc_y"])
glued["mean"] = glued["f*"] + glued["f_bar"]
truth = truth_field(glued["pred_loc_x"], glued["pred_loc_y"])
rmse = float(np.sqrt(np.mean((glued["mean"] - truth)**2)))
print(f"glued predictions: {len(glued)};  rmse vs truth: {rmse:.4f}  (obs noise 0.05)")"""),
    ("code", """\
fig, axs = plt.subplots(1, 3, figsize=(15, 4.2))
for ax, c, title, cmap in [
    (axs[0], glued["mean"], "glued posterior mean", "RdBu_r"),
    (axs[1], truth, "truth field", "RdBu_r"),
    (axs[2], np.sqrt(glued["y_var"]), "predictive std", "viridis"),
]:
    s = ax.scatter(glued["pred_loc_x"]/1e3, glued["pred_loc_y"]/1e3, c=c, s=4, cmap=cmap)
    ax.set(title=title, xlabel="x [km]", aspect="equal")
    fig.colorbar(s, ax=ax)
plt.tight_layout(); plt.show()"""),
    ("markdown", """\
## Where to go next

- **Sparse / variational models** for big tiles: set `"oi_model":
  "GPflowSGPRModel"` (collapsed bound, chunked to 100k points/tile) or
  `"GPflowSVGPModel"` (non-Gaussian likelihoods; Gaussian defaults to the
  exact collapsed solver).
- **TPU**: run the same config with `oi.run(..., mesh="all")` on a TPU VM —
  the expert axis shards over all chips with zero cross-device traffic.
- **Multi-host**: `python -m gpsat_tpu.distributed config.json --merge`
  (docs/multihost.md).
- **Reference stores**: existing GPSat HDF5 files load directly
  (PyTables read-only interop), as do zarr v2 stores.
- Docs: `docs/getting_started.md`, `docs/architecture.md`, `docs/api.md`."""),
]


def build():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3", "language": "python"}
    for kind, src in CELLS:
        cell = nbf.v4.new_markdown_cell(src) if kind == "markdown" else nbf.v4.new_code_cell(src)
        nb.cells.append(cell)
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-execute", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "examples", "inline_example.ipynb"))
    args = ap.parse_args()

    nb = build()
    if not args.no_execute:
        from nbclient import NotebookClient

        # hermetic execution: a stale shared compile cache (entries
        # AOT-compiled on a different host) spews XLA feature-mismatch
        # warnings into cell outputs
        os.environ["GPSAT_NO_COMPILE_CACHE"] = "1"
        client = NotebookClient(
            nb, timeout=1800, kernel_name="python3",
            resources={"metadata": {"path": REPO}},
        )
        client.execute()
    with open(args.out, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {args.out} ({'executed' if not args.no_execute else 'unexecuted'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
