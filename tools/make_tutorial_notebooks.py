"""Generate + execute the tutorial notebook set.

The reference ships four tutorial notebooks besides the flagship demo
(ref: docs/notebooks/gp_regression.ipynb, 1d_local_expert_model_part_1/
part_2.ipynb, using_gpus.ipynb). This builds the TPU-rebuild equivalents
from the same flows as examples/tutorial_*.py, executes them (nbclient,
CPU-forced so they run anywhere) and writes them under examples/.

Run: python tools/make_tutorial_notebooks.py [--no-execute] [--only NAME]
"""

import argparse
import os
import sys

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SETUP = """\
import os
os.chdir(globals().get("_REPO", os.getcwd()))
import jax
jax.config.update("jax_platforms", "cpu")   # notebook: run anywhere
import gpsat_tpu
gpsat_tpu.enable_x64()                      # f64 = reference-parity mode

import numpy as np
import pandas as pd
import scipy.stats
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt"""


GP_REGRESSION = [
    ("markdown", """\
# GP regression: the model API

The single-expert model contract every model in the zoo implements
(the TPU-native equivalent of the reference's `gp_regression` notebook;
ref: GPSat/models/base_model.py:17-448):

- construct from a DataFrame or arrays (`coords`, `obs`),
- a **reflection-based parameter API**: every name in `param_names` has
  `get_<name>` / `set_<name>` methods (+ `set_<name>_constraints`),
- `predict` works before *and* after `optimise_parameters` (prior vs
  posterior),
- `get_objective_function_value()` is the (negative) training objective.

The flagship exact-GPR model runs the batched JAX core under the hood —
the same math the TPU engine vmaps over hundreds of experts."""),
    ("code", _SETUP),
    ("code", """\
from gpsat_tpu.models import get_model

rng = np.random.default_rng(0)
N, L, noise_std = 30, 5.0, 0.05
X_grid = np.linspace(-L, L, 100)
X = rng.uniform(-L, L, N)
f = np.cos
y = f(X) + noise_std * rng.standard_normal(N)
f_truth = f(X_grid)

GPRModel = get_model("GPflowGPRModel")   # registry alias = reference name
gpr = GPRModel(coords=X, obs=y, kernel="RBF")
print("param_names:", gpr.param_names)
print("initial parameters:", {k: np.asarray(v).ravel() for k, v in gpr.get_parameters().items()})"""),
    ("markdown", """\
## Getting and setting hyperparameters

Every parameter has `get_*`/`set_*` accessors; `set_parameters(**kwargs)`
sets several at once. Constraints re-parameterize a value through a
sigmoid bijector onto `[low, high]` (ref: gpflow_models.py:416-494)."""),
    ("code", """\
gpr.set_kernel_variance(1.5)
gpr.set_likelihood_variance(noise_std**2)
gpr.set_parameter_constraints({"lengthscales": {"low": 0.05, "high": 10.0}})
print("after set:", {k: np.asarray(v).ravel() for k, v in gpr.get_parameters().items()})"""),
    ("markdown", """\
## Prediction before training

`predict` with the initial parameters gives the prior-conditioned fit —
usually over-smooth with badly calibrated variance."""),
    ("code", """\
pred0 = gpr.predict(X_grid[:, None])
m0 = np.asarray(pred0["f*"]).ravel()
s0 = np.sqrt(np.asarray(pred0["f*_var"]).ravel())
print(f"before training: MSE {np.mean((f_truth - m0)**2):.4f}, "
      f"MLL {scipy.stats.norm.logpdf(f_truth, m0, s0).mean():.4f}")"""),
    ("markdown", """\
## Train, then predict again

`optimise_parameters()` runs L-BFGS on the negative log marginal
likelihood to the same tolerances as the reference's scipy optimizer and
returns a convergence flag. The prediction dict uses the reference key
set: `f*`, `f*_var`, `y_var`, `f_bar`."""),
    ("code", """\
ok = gpr.optimise_parameters()
print("converged:", ok)
for k, v in gpr.get_parameters().items():
    print(f"  {k} : {np.asarray(v).ravel()}")
print(f"objective = {gpr.get_objective_function_value():.4f}")

pred = gpr.predict(X_grid[:, None])
m = np.asarray(pred["f*"]).ravel()
s = np.sqrt(np.asarray(pred["f*_var"]).ravel())
mse = np.mean((f_truth - m)**2)
print(f"after training : MSE {mse:.4f}, "
      f"MLL {scipy.stats.norm.logpdf(f_truth, m, s).mean():.4f}")
assert ok and mse < 0.01

fig, ax = plt.subplots(figsize=(8, 4))
ax.plot(X_grid, f_truth, "k", label="truth")
ax.scatter(X, y, c="C3", s=14, alpha=0.6, label="observations")
ax.plot(X_grid, m, "C0", label="posterior mean")
ax.fill_between(X_grid, m - 1.96*s, m + 1.96*s, color="C0", alpha=0.25, label="95% CI")
ax.legend(); fig.tight_layout()"""),
]


_ONED_SETUP = _SETUP + """

import tempfile
from gpsat_tpu.config import (
    DataConfig, ExpertLocsConfig, ModelConfig, PredictionLocsConfig,
)
from gpsat_tpu.experts import LocalExpertOI, get_results_from_h5file

rng = np.random.default_rng(0)
N, noise_std = 100, 0.05
X_grid = np.linspace(0.1, 0.6, 100)
X = rng.uniform(0.1, 0.6, N)
f = lambda x: np.sin(1.0 / x)
y = f(X) + noise_std * rng.standard_normal(N)
data_df = pd.DataFrame({"x": X, "y": y})
grid_df = pd.DataFrame({"x": X_grid})
store = os.path.join(tempfile.mkdtemp(), "tutorial_1d.h5")"""


ONED_PART1 = [
    ("markdown", """\
# 1-D local-expert model, part 1: fitting

`y = sin(1/x)` is non-stationary: no single lengthscale fits both the
fast-wiggling left side and the smooth right side. Local experts solve
this by fitting **independent GPs on overlapping windows** — the core
idea of the whole framework (ref: docs/notebooks/
1d_local_expert_model_part_1.ipynb; orchestrator:
GPSat/local_experts.py:116-1279).

This part runs two experts through the config-dataclass API and inspects
what lands in the results store. Part 2 glues the overlapping predictions
into one field."""),
    ("code", _ONED_SETUP),
    ("markdown", """\
## Configure and run

Four config dataclasses drive `LocalExpertOI` (same JSON-compatible
schema as the reference):

- **expert locations**: two experts at x = 0.25, 0.45,
- **data**: the noisy samples, with a `local_select` radius of 0.15
  around each expert,
- **model**: exact GPR (JAX core),
- **prediction locations**: the fine grid, masked to an inference radius
  per expert.

`run` fits every expert (batched into one jitted XLA program per tile
bucket) and appends reference-schema tables to the HDF5 store."""),
    ("code", """\
training_radius = 0.15
inference_radius = training_radius + 1e-8
locexp = LocalExpertOI(
    expert_loc_config=ExpertLocsConfig(source=pd.DataFrame({"x": [0.25, 0.45]})),
    model_config=ModelConfig(
        oi_model="GPflowGPRModel",
        init_params={"kernel": "RBF", "likelihood_variance": noise_std**2},
    ),
    data_config=DataConfig(
        data_source=data_df, obs_col=["y"], coords_col=["x"],
        local_select=[
            {"col": "x", "comp": "<=", "val": training_radius},
            {"col": "x", "comp": ">=", "val": -training_radius},
        ],
    ),
    pred_loc_config=PredictionLocsConfig(
        method="from_dataframe", df=grid_df, max_dist=inference_radius),
)
locexp.run(store_path=store)"""),
    ("markdown", """\
## What's in the results store

The store holds `oi_config`, `expert_locs`, `run_details`, `preds`, and
one table per hyperparameter, all indexed by expert location — the same
schema the reference writes, so its readers work unchanged."""),
    ("code", """\
dfs, configs = get_results_from_h5file(store)
print("tables:", sorted(dfs.keys()))
print(dfs["run_details"][["num_obs", "objective_value", "optimise_success", "num_iter"]])
print(dfs["lengthscales"])"""),
    ("markdown", """\
## Per-expert predictions (un-glued)

Each expert predicts only inside its inference radius; the windows
overlap in the middle. Part 2 resolves the overlap with Gaussian
distance weights."""),
    ("code", """\
preds = dfs["preds"]
fig, ax = plt.subplots(figsize=(8, 4))
ax.plot(X_grid, f(X_grid), "k", lw=1, label="truth")
ax.scatter(X, y, c="C3", s=10, alpha=0.4, label="observations")
for i, (xl, g) in enumerate(preds.groupby("x")):
    g = g.sort_values("pred_loc_x")
    m, s = g["f*"].values, np.sqrt(g["f*_var"].values)
    ax.plot(g["pred_loc_x"], m, f"C{i}", label=f"expert at x={xl:.2f}")
    ax.fill_between(g["pred_loc_x"], m - 1.96*s, m + 1.96*s, color=f"C{i}", alpha=0.2)
ax.legend(); fig.tight_layout()"""),
]


ONED_PART2 = [
    ("markdown", """\
# 1-D local-expert model, part 2: gluing and expert density

Overlapping expert predictions are combined with **normalized Gaussian
weights** centered on each expert (sigma = inference_radius / 3, so 99%
of the mass falls inside the radius — ref: GPSat/postprocessing.py:447-515).
This part glues the part-1 predictions and shows that more, narrower
experts fit the non-stationary field better."""),
    ("code", _ONED_SETUP),
    ("code", """\
from gpsat_tpu.postprocess import glue_local_predictions_1d

def run_experiment(xprt_locs, training_radius):
    inference_radius = training_radius + 1e-8
    locexp = LocalExpertOI(
        expert_loc_config=ExpertLocsConfig(source=pd.DataFrame({"x": xprt_locs})),
        model_config=ModelConfig(
            oi_model="GPflowGPRModel",
            init_params={"kernel": "RBF", "likelihood_variance": noise_std**2},
        ),
        data_config=DataConfig(
            data_source=data_df, obs_col=["y"], coords_col=["x"],
            local_select=[
                {"col": "x", "comp": "<=", "val": training_radius},
                {"col": "x", "comp": ">=", "val": -training_radius},
            ],
        ),
        pred_loc_config=PredictionLocsConfig(
            method="from_dataframe", df=grid_df, max_dist=inference_radius),
    )
    if os.path.exists(store):
        os.remove(store)
    locexp.run(store_path=store)
    dfs, _ = get_results_from_h5file(store)
    return glue_local_predictions_1d(
        preds_df=dfs["preds"], pred_loc_col="pred_loc_x", xprt_loc_col="x",
        vars_to_glue=["f*", "f*_var"], inference_radius=inference_radius,
    )

def score(glued):
    m, s = glued["f*"].values, np.sqrt(glued["f*_var"].values)
    truth = f(glued["pred_loc_x"].values)
    return np.mean((truth - m)**2), scipy.stats.norm.logpdf(truth, m, s).mean()"""),
    ("markdown", "## Two experts, radius 0.15"),
    ("code", """\
glued2 = run_experiment([0.25, 0.45], 0.15)
mse2, mll2 = score(glued2)
print(f"2 experts: MSE {mse2:.4f}, MLL {mll2:.4f}")"""),
    ("markdown", """\
## Using more local experts

Four experts with a tighter radius: each window is closer to stationary,
so the per-expert lengthscales specialize and the glued field improves."""),
    ("code", """\
glued4 = run_experiment([0.2, 0.3, 0.4, 0.5], 0.1)
mse4, mll4 = score(glued4)
print(f"4 experts: MSE {mse4:.4f}, MLL {mll4:.4f}")
assert mse4 < 0.05

fig, ax = plt.subplots(figsize=(8, 4))
ax.plot(X_grid, f(X_grid), "k", label="truth")
ax.scatter(X, y, c="C3", s=10, alpha=0.4, label="observations")
for glued, color, label in [(glued2, "C1", "2 experts"), (glued4, "C0", "4 experts")]:
    g = glued.sort_values("pred_loc_x")
    m, s = g["f*"].values, np.sqrt(g["f*_var"].values)
    ax.plot(g["pred_loc_x"], m, color, label=f"glued ({label})")
    ax.fill_between(g["pred_loc_x"], m - 1.96*s, m + 1.96*s, color=color, alpha=0.2)
ax.legend(); fig.tight_layout()"""),
]


USING_TPUS = [
    ("markdown", """\
# Using TPUs (and any other accelerator)

The reference's `using_gpus` notebook shows how to hand the model a GPU;
in this rebuild there is nothing to hand over — **the expert axis is the
parallel axis**, and the batched engine shards it over whatever
`jax.devices()` reports (TPU chips over ICI, GPU, or CPU cores). The
same script runs unchanged everywhere; only throughput changes.

This notebook *fakes* an 8-device CPU mesh (the same trick
`tests/conftest.py` uses) so the multi-device path executes anywhere.
On a real TPU slice, skip the XLA_FLAGS cell: `jax.devices()` already
lists the chips."""),
    ("code", """\
import os
os.chdir(globals().get("_REPO", os.getcwd()))
# BEFORE any jax device use: fake 8 CPU devices (on a real TPU slice,
# drop this cell)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax
jax.config.update("jax_platforms", "cpu")
import gpsat_tpu
gpsat_tpu.enable_x64()   # CPU parity mode (a real TPU run stays f32)
import numpy as np
print(jax.devices())"""),
    ("markdown", """\
## A device mesh over the expert axis

`parallel.engine.make_batched_runner(mesh=...)` wraps the per-tile
fit+predict program in `shard_map` over a 1-d `experts` mesh axis: each
device optimizes its local slice of the expert batch with **no
cross-device communication** (experts are independent — the whole
framework is an embarrassingly parallel mixture of local experts)."""),
    ("code", """\
from jax.sharding import Mesh
from gpsat_tpu.experts import bijectors_from
from gpsat_tpu.models.functional import make_gpr_core
from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch
from gpsat_tpu.parallel.batching import TileBatch

rng = np.random.default_rng(0)
B, N, P, D = 16, 64, 8, 2      # 16 experts -> 2 per device
X = rng.uniform(-4, 4, (B, N, D))
y = np.sin(X[..., 0]) * np.cos(X[..., 1]) + 0.1 * rng.normal(size=(B, N))
batch = TileBatch(
    X=X, y=y, mask=np.ones((B, N)), Xnew=rng.uniform(-3, 3, (B, P, D)),
    pred_mask=np.ones((B, P)), obs_mean=np.zeros(B),
    expert_index=np.arange(B), num_obs=np.full(B, N),
)
init = {"lengthscales": np.ones((B, D)), "kernel_variance": np.ones(B),
        "likelihood_variance": 0.1 * np.ones(B)}

core = make_gpr_core(kernel="Matern32", bijectors=bijectors_from(None))
mesh = Mesh(np.array(jax.devices()), axis_names=("experts",))
sharded = make_batched_runner(core, max_iter=400, mesh=mesh)
res = run_tile_batch(batch, init, sharded, core)
print("converged:", int(res["converged"].sum()), "/", B)
print("lengthscales[0]:", res["lengthscales"][0])"""),
    ("markdown", """\
## Sharded == unsharded

Sharding is a pure execution-layout change — the sharded program
reproduces the single-device results to numerical-noise level (the two
programs compile separately, so the last-bit arithmetic can differ;
`tests/test_engine.py` pins this in f64)."""),
    ("code", """\
unsharded = make_batched_runner(core, max_iter=400)
ref = run_tile_batch(batch, init, unsharded, core)
print("max |f_mean diff|:", float(np.max(np.abs(res["f_mean"] - ref["f_mean"]))))
assert np.allclose(res["f_mean"], ref["f_mean"], atol=1e-8)"""),
    ("markdown", """\
## What changes on a real TPU

- **dtype**: TPU production mode runs f32 with the fused
  analytic-gradient LML and blocked triangular inverse; f64 on CPU is
  reference-parity mode (`gpsat_tpu.enable_x64()`). Accuracy evidence:
  f32 predictions land ~2e-3 of the f64 gold; an optional f64 polish
  pass (`optim_kwargs={"polish": "f64"}`) reaches ~1e-6.
- **matmul precision**: GP Cholesky conditioning needs f32-grade
  products, so the hot matmuls pin 6-pass bf16 emulation
  (`ops/precision.py`; `GPSAT_MM_PRECISION=high` trades ~1e-7 relative
  error for ~2x MXU rate on the matmul-bound large-N path).
- **the orchestrator does this automatically**: `LocalExpertOI.run`
  builds the mesh from `jax.devices()` (or the JSON config's mesh spec)
  and buckets/pads expert tiles per device — no user code changes.
- **multi-host**: `python -m gpsat_tpu.distributed config.json` shards
  experts across hosts over DCN with per-host stores + merge
  (docs/multihost.md)."""),
]


END_TO_END_DEMO = [
    ("markdown", """\
# End-to-end demo: raw satellite files → gridded posterior field

The flagship workflow — the TPU-rebuild equivalent of the reference's
`examples/sea_ice_freeboard/demo.ipynb` and the `notebooks/` pipeline set
(`read_raw_data_and_store` → `bin_raw_data` → `local_experts_from_config_class`
→ postprocess → plot). Real sea-ice data isn't shipped, so stage 0 samples
noisy pseudo-satellite tracks from a known ground-truth field
(ref: examples/Archive/sample_from_ground_truth.py) — which also lets the
final panel measure recovery error against the truth.

Five stages, each driven by the same config dicts the JSON CLIs take:

1. **ingest** — raw per-track CSVs → one HDF5 obs table (resumable batch ledger)
2. **bin** — obs → regular-grid cells (`scipy.binned_statistic_2d` conventions)
3. **local-expert OI** — grid of GPR experts, radius data select, fine
   prediction grid; on TPU this is where the batched JAX engine takes over
4. **postprocess** — Gaussian-smooth the hyperparameter fields, re-predict
5. **glue + plot** — weighted-average overlapping expert predictions, compare
   to the ground truth

Runs anywhere (CPU-forced, f64 reference-parity mode); the last section says
what changes on TPU hardware."""),
    ("code", _SETUP),
    ("code", """\
import tempfile, os, json, glob
work = tempfile.mkdtemp(prefix="gpsat_demo_")
print("working under:", work)"""),
    ("markdown", """\
## Stage 0 — synthetic "satellite" observations

A smooth ground-truth field plus straight tracks across the domain; each
track samples the field with i.i.d. noise. Two pseudo-satellites write
per-track CSV files into separate directories — the shape raw altimetry
deliveries actually arrive in."""),
    ("code", """\
from gpsat_tpu.synthetic import make_ground_truth_field, make_tracks, sample_from_ground_truth

EXTENT, NOISE = 10.0, 0.1
field, xg, yg = make_ground_truth_field(extent=EXTENT, n=81, seed=7)   # 0.25 spacing
raw_dir = os.path.join(work, "raw")
n_files = 0
for si, sat in enumerate(["sat_a", "sat_b"]):
    os.makedirs(os.path.join(raw_dir, sat), exist_ok=True)
    tracks = make_tracks(extent=EXTENT, n_tracks=14, pts_per_track=260, seed=20 + si)
    obs = sample_from_ground_truth(tracks, field, xg, yg, noise_std=NOISE, obs_col="z", seed=si)
    obs["date"] = "2020-03-01"
    for t, grp in obs.groupby(obs.index // 260):
        grp.to_csv(os.path.join(raw_dir, sat, f"track_{t:03d}.csv"), index=False)
        n_files += 1
print(f"wrote {n_files} track files")"""),
    ("markdown", """\
## Stage 1 — ingest: raw files → one HDF5 obs table

`read_and_store` walks the directories, concatenates matching files and
appends them to a store table — with a **batch ledger** (`_data_batches`)
so an interrupted or repeated run skips what's already in
(ref: GPSat/read_and_store.py:176-315). The same call is available as
`python -m gpsat_tpu.read_and_store config.json`."""),
    ("code", """\
from gpsat_tpu.data.ingest import read_and_store
from gpsat_tpu.data.store import TableStore

obs_file = os.path.join(work, "obs.h5")
read_and_store(
    output={"file": obs_file, "table": "data"},
    file_dirs=raw_dir,
    sub_dirs=["sat_a", "sat_b"],
    file_regex=r"track_\\d+\\.csv",
    read_engine="csv",
)
# resumable: a second call finds both batches in the ledger and skips them
read_and_store(
    output={"file": obs_file, "table": "data"},
    file_dirs=raw_dir,
    sub_dirs=["sat_a", "sat_b"],
    file_regex=r"track_\\d+\\.csv",
    read_engine="csv",
)
with TableStore(obs_file, mode="r") as store:
    raw_obs = store.select("data", set_index=False)
    ledger = store.select("_data_batches", set_index=False)
print(ledger[["batch", "rows"]])
assert len(raw_obs) == int(ledger["rows"].sum())   # no duplicate ingest"""),
    ("markdown", """\
## Stage 2 — bin onto a regular grid

Per-cell means on a fixed lattice knock raw track observations down to one
value per cell (ref: GPSat/bin_data.py:574-699; same
`scipy.stats.binned_statistic_2d` conventions as the reference runtime).
`by_cols=["date"]` keeps days separate — with real multi-date data this is
the streaming `load_by` axis."""),
    ("code", """\
from gpsat_tpu.data.binning import BinData

binned_file = os.path.join(work, "binned.h5")
df_bin, stats = BinData().bin_data(
    input={"source": obs_file, "table": "data"},
    bin_config={
        "by_cols": ["date"], "val_col": "z",
        "x_col": "x", "y_col": "y", "grid_res": 0.5,
        "x_range": [-EXTENT, EXTENT], "y_range": [-EXTENT, EXTENT],
    },
    output={"file": binned_file, "table": "data"},
)
print(f"{len(raw_obs)} raw obs -> {len(df_bin)} grid cells")
df_bin.head()"""),
    ("markdown", """\
## Stage 3 — local-expert optimal interpolation

A 4×4 grid of exact-GPR experts; each selects binned obs within a radius
of itself, optimises its hyperparameters, and predicts on the shared fine
grid inside `max_dist` of itself (ref: GPSat/local_experts.py:761-1279).
The config dict below is exactly what
`python -m gpsat_tpu.local_expert_oi config.json` takes — and on a TPU
host the same config runs the experts **batched** through the vmap/
shard_map engine instead of this serial CPU loop."""),
    ("code", """\
from gpsat_tpu.local_expert_oi import run_from_config
from gpsat_tpu.experts import get_results_from_h5file

ex = np.linspace(-7.5, 7.5, 4)
experts = pd.DataFrame([(x, y) for x in ex for y in ex], columns=["x", "y"])
pred_grid = pd.DataFrame(
    np.stack(np.meshgrid(xg, yg), axis=-1).reshape(-1, 2), columns=["x", "y"]
)
store_path = os.path.join(work, "results.h5")
oi_config = {
    "locations": {"source": experts},
    "data": {
        "data_source": binned_file,
        "table": "data",
        "obs_col": "z",
        "coords_col": ["x", "y"],
        # multi-col entry -> euclidean-radius select (KDTree / C++ grid hash)
        "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.5}],
    },
    "model": {
        "oi_model": "GPflowGPRModel",
        "init_params": {"noise_variance": NOISE**2},
        "optim_kwargs": {"max_iter": 250},
    },
    "pred_loc": {"method": "from_dataframe", "df": pred_grid, "max_dist": 3.5},
    "run_kwargs": {"store_path": store_path},
}
run_from_config(oi_config)

dfs, stored_configs = get_results_from_h5file(store_path)
rd = dfs["run_details"]
print(rd[["num_obs", "objective_value", "num_iter", "run_time"]].describe().loc[["mean", "min", "max"]])
assert bool(rd["optimise_success"].all())"""),
    ("markdown", """\
## Stage 4 — smooth hyperparameter fields, re-predict

Independently-fit experts give noisy hyperparameter maps; Gaussian-kernel
smoothing over the expert grid regularises them, then a **predict-only**
second pass re-runs the sweep with the smoothed values loaded
(ref: GPSat/postprocessing.py:96-380 — two-phase design, the emitted
config has `optimise=False` + `load_params`)."""),
    ("code", """\
from gpsat_tpu.postprocess import SmoothingConfig, smooth_hyperparameters

cfg_path = smooth_hyperparameters(
    result_file=store_path,
    params_to_smooth=["lengthscales", "kernel_variance"],
    smooth_config_dict={
        "lengthscales": SmoothingConfig(l_x=10.0, l_y=10.0),
        "kernel_variance": SmoothingConfig(l_x=10.0, l_y=10.0),
    },
)
with open(cfg_path) as f:
    emitted = json.load(f)[-1]
print("emitted config: optimise =", emitted["run_kwargs"]["optimise"],
      "| load_params =", emitted["model"]["load_params"])

predict_only = {
    **oi_config,
    "model": {**oi_config["model"], **{k: emitted["model"][k] for k in ("load_params",)}},
    "run_kwargs": {
        "store_path": store_path, "optimise": False, "table_suffix": "_SMOOTHED",
        "skip_valid_checks_on": ["model", "run_kwargs"],
    },
}
run_from_config(predict_only)
dfs_sm, _ = get_results_from_h5file(store_path, table_suffix="_SMOOTHED")
preds = dfs_sm["preds_SMOOTHED"]
print(f"{len(preds)} expert-prediction rows on the fine grid")"""),
    ("markdown", """\
## Stage 5 — glue overlapping experts, compare to the truth

Neighbouring experts predict the same grid cells; `glue_local_predictions`
blends them with distance-based Gaussian weights (σ = radius/3 puts ~99%
of the mass inside the inference radius, ref:
GPSat/postprocessing.py:447-577). Because stage 0 kept the ground truth,
the recovery error is measurable — the posterior mean should land well
under the observation noise."""),
    ("code", """\
from gpsat_tpu.postprocess import glue_local_predictions

glued = glue_local_predictions(preds, inference_radius=3.5)
truth = pd.DataFrame({
    "pred_loc_x": pred_grid["x"], "pred_loc_y": pred_grid["y"],
    "truth": field.ravel(order="C"),
})
# field[i, j] = value at (xg[j], yg[i]) -> ravel matches meshgrid stacking
merged = glued.merge(truth, on=["pred_loc_x", "pred_loc_y"], how="inner")
rmse = float(np.sqrt(np.mean((merged["f*"] - merged["truth"]) ** 2)))
print(f"glued cells: {len(merged)} | RMSE vs truth: {rmse:.4f} (obs noise {NOISE})")
assert rmse < NOISE, "posterior mean should beat the observation noise floor"

fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))
grid = merged.pivot(index="pred_loc_y", columns="pred_loc_x", values="f*")
tgrid = merged.pivot(index="pred_loc_y", columns="pred_loc_x", values="truth")
sgrid = np.sqrt(merged.pivot(index="pred_loc_y", columns="pred_loc_x", values="f*_var"))
vmin, vmax = np.nanmin(tgrid.values), np.nanmax(tgrid.values)
for ax, (g, title) in zip(axes, [(tgrid, "ground truth"), (grid, "glued posterior mean"),
                                 (sgrid, "posterior std")]):
    kw = dict(vmin=vmin, vmax=vmax) if title != "posterior std" else {}
    im = ax.pcolormesh(g.columns.values, g.index.values, g.values, shading="nearest", **kw)
    ax.plot(experts["x"], experts["y"], "k^", ms=5)
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
fig.tight_layout()"""),
    ("markdown", """\
## The same pipeline on TPU hardware

Nothing above changes structurally — the configs are identical. On a TPU
host the orchestrator:

- buckets experts into padded tiles and runs them **batched** (vmap) and
  **sharded** (shard_map over the device mesh) instead of serially —
  hundreds of experts per device step;
- switches to f32 production mode: fused analytic-gradient LML, blocked
  triangular inverse, 6-pass matmul emulation for GP-grade conditioning
  (`ops/precision.py`); an optional f64 `polish` pass recovers ~1e-6
  agreement with the CPU gold;
- scales past one host with `python -m gpsat_tpu.distributed config.json`
  — experts partitioned across hosts, per-host stores, byte-identical
  `merge_stores` (docs/multihost.md).

See `examples/using_tpus.ipynb` for the engine-level view and
`bench_pipeline.py` for the pan-Arctic-geometry benchmark of exactly this
workflow."""),
]


BOOKS = {
    "gp_regression": GP_REGRESSION,
    "1d_local_expert_model_part_1": ONED_PART1,
    "1d_local_expert_model_part_2": ONED_PART2,
    "using_tpus": USING_TPUS,
    "end_to_end_demo": END_TO_END_DEMO,
}


def build(cells):
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3", "language": "python"}
    for kind, src in cells:
        # stamp the repo path into executed cells so os.chdir works from
        # any kernel cwd
        if kind == "code":
            src = src.replace('globals().get("_REPO", os.getcwd())', repr(REPO))
        cell = nbf.v4.new_markdown_cell(src) if kind == "markdown" else nbf.v4.new_code_cell(src)
        nb.cells.append(cell)
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-execute", action="store_true")
    ap.add_argument("--only", default=None, choices=sorted(BOOKS))
    args = ap.parse_args()

    for name, cells in BOOKS.items():
        if args.only and name != args.only:
            continue
        nb = build(cells)
        if not args.no_execute:
            from nbclient import NotebookClient

            # hermetic execution: a stale shared compile cache (entries
            # AOT-compiled on a different host) spews XLA feature-mismatch
            # warnings into cell outputs
            os.environ["GPSAT_NO_COMPILE_CACHE"] = "1"
            NotebookClient(
                nb, timeout=1800, kernel_name="python3",
                resources={"metadata": {"path": REPO}},
            ).execute()
        out = os.path.join(REPO, "examples", f"{name}.ipynb")
        with open(out, "w") as fh:
            nbf.write(nb, fh)
        print(f"wrote {out} ({'executed' if not args.no_execute else 'unexecuted'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
