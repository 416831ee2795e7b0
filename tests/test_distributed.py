"""Multi-host execution: 2 real processes, local coordinator, merged stores.

Proves the docs/multihost.md design end-to-end on CPU (SURVEY.md §2.9 DCN
row): two OS processes each with 4 virtual devices, joined through
``jax.distributed.initialize``, each running its deterministic expert
partition on its local-device mesh and writing a per-host store; process 0
merges. The merged tables must match a single-process run of the same
config exactly (same f64 CPU arithmetic, same shape buckets).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.store import TableStore

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """Obs CSV + expert CSV + the experiment config dict (store_path unset)."""
    tmp = tmp_path_factory.mktemp("dist")
    rng = np.random.default_rng(7)
    n = 180
    obs = pd.DataFrame({"x": rng.uniform(0, 10, n), "y": rng.uniform(0, 10, n)})
    obs["obs"] = np.sin(obs["x"]) * np.cos(obs["y"]) + 0.1 * rng.normal(size=n)
    obs_csv = str(tmp / "obs.csv")
    obs.to_csv(obs_csv, index=False)

    # 8 experts; radius 3 box-select keeps every tile under one shape
    # bucket (Nmax=128). 8 experts / 4 devices single-process vs
    # 4 experts / 2 devices per host give the SAME per-shard shape
    # [2, 128, ...], so the compiled per-shard program — and therefore
    # every result bit — is identical between the runs.
    experts = pd.DataFrame(
        {
            "x": [2.0, 2.0, 4.0, 4.0, 6.0, 6.0, 8.0, 8.0],
            "y": [3.0, 7.0, 3.0, 7.0, 3.0, 7.0, 3.0, 7.0],
        }
    )
    experts_csv = str(tmp / "experts.csv")
    experts.to_csv(experts_csv, index=False)

    cfg = {
        "locations": {"source": experts_csv},
        "data": {
            "data_source": obs_csv,
            "obs_col": "obs",
            "coords_col": ["x", "y"],
            "local_select": [{"col": ["x", "y"], "comp": "<", "val": 3.0}],
        },
        "model": {
            "oi_model": "GPflowGPRModel",
            "init_params": {"kernel": "Matern32", "noise_variance": 0.01},
            "optim_kwargs": {"max_iter": 300},
        },
        "pred_loc": {"method": "expert_loc"},
    }
    return tmp, cfg


def _run_cli(cfg, store_path, extra_args, tmp, tag, devices=4):
    cfg = json.loads(json.dumps(cfg))
    cfg["run_kwargs"] = {"store_path": store_path}
    cfg_path = str(tmp / f"cfg_{tag}.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    cmd = [
        sys.executable, "-m", "gpsat_tpu.distributed", cfg_path,
        "--platform", "cpu", "--x64", "--devices-per-process", str(devices),
    ] + extra_args
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )


def _sorted_table(path, table, drop=()):
    with TableStore(path, mode="r") as store:
        df = store.select(table, set_index=False)
    sort_cols = [c for c in ("x", "y") if c in df.columns]
    sort_cols += sorted(c for c in df.columns if c.startswith("_dim_"))
    sort_cols += sorted(c for c in df.columns if c.startswith("pred_loc_"))
    df = df.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    return df.drop(columns=[c for c in drop if c in df.columns])


@pytest.mark.slow
def test_two_process_run_matches_single(experiment):
    tmp, cfg = experiment
    single_store = str(tmp / "single.h5")
    multi_store = str(tmp / "multi.h5")

    # single-process reference (same CLI, no coordinator)
    p = _run_cli(cfg, single_store, [], tmp, "single")
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, f"single-process run failed:\n{out}"

    # two processes through a local coordinator; process 0 merges
    port = _free_port()
    procs = []
    for pid in range(2):
        args = [
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid),
        ] + (["--merge"] if pid == 0 else [])
        procs.append(_run_cli(cfg, multi_store, args, tmp, f"p{pid}", devices=2))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # per-host stores exist and split the experts 4 / 4
    h0, h1 = (str(tmp / f"multi.h{h}.h5") for h in range(2))
    for hp, n_expected in ((h0, 4), (h1, 4)):
        with TableStore(hp, mode="r") as store:
            assert len(store.select("run_details")) == n_expected

    # merged store equals the single-process run exactly
    assert os.path.exists(multi_store)
    volatile = ("run_time", "device", "datetime")
    for table in ("run_details", "preds", "expert_locs", "lengthscales",
                  "kernel_variance", "likelihood_variance"):
        a = _sorted_table(single_store, table, drop=volatile)
        b = _sorted_table(multi_store, table, drop=volatile)
        assert list(a.columns) == list(b.columns), table
        for c in a.columns:
            if a[c].dtype.kind == "f":
                np.testing.assert_array_equal(
                    a[c].values, b[c].values, err_msg=f"{table}.{c} differs"
                )
            else:
                assert a[c].tolist() == b[c].tolist(), f"{table}.{c} differs"


@pytest.mark.slow
def test_four_process_uneven_partition_matches_single(experiment):
    """4 OS processes, 10 experts -> 3/3/2/2 partition (uneven), merged
    result vs single-process run. Shard shapes differ between the runs
    (B=10 single vs 3/3/2/2 padded per host), so equality is to f64
    roundoff rather than bit-exact (same tolerance class as the 3-process
    validation in ROUND3_NOTES)."""
    tmp, cfg = experiment
    # 10 experts: not a multiple of 4 processes
    experts = pd.DataFrame(
        {
            "x": [2.0, 2.0, 4.0, 4.0, 6.0, 6.0, 8.0, 8.0, 3.0, 7.0],
            "y": [3.0, 7.0, 3.0, 7.0, 3.0, 7.0, 3.0, 7.0, 5.0, 5.0],
        }
    )
    experts_csv = str(tmp / "experts10.csv")
    experts.to_csv(experts_csv, index=False)
    cfg = json.loads(json.dumps(cfg))
    cfg["locations"] = {"source": experts_csv}

    single_store = str(tmp / "single10.h5")
    multi_store = str(tmp / "multi10.h5")

    p = _run_cli(cfg, single_store, [], tmp, "single10", devices=2)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"single-process run failed:\n{out}"

    port = _free_port()
    procs = []
    for pid in range(4):
        args = [
            "--coordinator", f"localhost:{port}",
            "--num-processes", "4", "--process-id", str(pid),
        ] + (["--merge"] if pid == 0 else [])
        procs.append(_run_cli(cfg, multi_store, args, tmp, f"q{pid}", devices=1))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # per-host ledgers carry the deterministic row%P partition: 3/3/2/2
    for h, n_expected in enumerate((3, 3, 2, 2)):
        with TableStore(str(tmp / f"multi10.h{h}.h5"), mode="r") as store:
            assert len(store.select("run_details")) == n_expected, f"host {h}"

    volatile = ("run_time", "device", "datetime")
    for table in ("run_details", "preds", "lengthscales",
                  "kernel_variance", "likelihood_variance"):
        a = _sorted_table(single_store, table, drop=volatile)
        b = _sorted_table(multi_store, table, drop=volatile)
        assert list(a.columns) == list(b.columns), table
        assert len(a) == len(b) == (len(a))
        for c in a.columns:
            if a[c].dtype.kind == "f" and c not in ("num_iter",):
                np.testing.assert_allclose(
                    a[c].values, b[c].values, rtol=1e-7, atol=1e-9,
                    err_msg=f"{table}.{c} differs",
                )
            elif c not in ("num_iter",):
                assert a[c].tolist() == b[c].tolist(), f"{table}.{c} differs"


def test_partition_and_paths():
    from gpsat_tpu.distributed import host_store_path, partition_expert_locs

    df = pd.DataFrame({"x": np.arange(7)})
    parts = [partition_expert_locs(df, 3, h) for h in range(3)]
    assert [len(p) for p in parts] == [3, 2, 2]
    # disjoint and complete
    allx = sorted(x for p in parts for x in p["x"])
    assert allx == list(range(7))
    assert host_store_path("a/b/res.h5", 2) == "a/b/res.h2.h5"
    assert host_store_path("res", 0) == "res.h0.h5"


def test_merge_stores_dedupes_configs(tmp_path):
    from gpsat_tpu.distributed import merge_stores

    cfg = {"model": {"oi_model": "GPflowGPRModel"}, "run_kwargs": {"store_path": "X"}}
    for h in range(2):
        with TableStore(str(tmp_path / f"r.h{h}.h5")) as store:
            c = json.loads(json.dumps(cfg))
            c["run_kwargs"]["store_path"] = f"r.h{h}.h5"  # differs per host
            store.append("oi_config", pd.DataFrame(
                {"config_id": [0], "datetime": ["t"], "config": [json.dumps(c)]}
            ))
            store.append("run_details", pd.DataFrame(
                {"num_obs": [h + 1]}, index=pd.Index([float(h)], name="x")
            ))
    out = str(tmp_path / "merged.h5")
    tables = merge_stores(str(tmp_path / "r.h*.h5"), out)
    assert set(tables) == {"oi_config", "run_details"}
    with TableStore(out, mode="r") as store:
        cfgs = store.select("oi_config", set_index=False)
        rd = store.select("run_details")
    # run_kwargs-only differences dedupe to one config row
    assert len(cfgs) == 1
    assert len(rd) == 2 and rd.index.names == ["x"]


def test_merge_stores_remaps_config_ids(tmp_path):
    """Hosts that ran different config subsets number config_ids
    differently; merge must remap run_details.config_id per host so rows
    keep pointing at their own config after the global renumbering."""
    from gpsat_tpu.distributed import merge_stores

    cfg_a = {"model": {"oi_model": "GPflowGPRModel"}}
    cfg_b = {"model": {"oi_model": "GPflowSGPRModel"}}
    # host 0 ran A (id 0) then B (id 1); host 1 only ran B (id 0)
    with TableStore(str(tmp_path / "r.h0.h5")) as store:
        store.append("oi_config", pd.DataFrame({
            "config_id": [0, 1], "datetime": ["t", "t"],
            "config": [json.dumps(cfg_a), json.dumps(cfg_b)],
        }))
        store.append("run_details", pd.DataFrame(
            {"num_obs": [10, 11], "config_id": [0, 1]},
            index=pd.Index([0.0, 1.0], name="x"),
        ))
    with TableStore(str(tmp_path / "r.h1.h5")) as store:
        store.append("oi_config", pd.DataFrame({
            "config_id": [0], "datetime": ["t"], "config": [json.dumps(cfg_b)],
        }))
        store.append("run_details", pd.DataFrame(
            {"num_obs": [12], "config_id": [0]},
            index=pd.Index([2.0], name="x"),
        ))
    out = str(tmp_path / "merged.h5")
    merge_stores(str(tmp_path / "r.h*.h5"), out)
    with TableStore(out, mode="r") as store:
        cfgs = store.select("oi_config", set_index=False)
        rd = store.select("run_details", set_index=False)
    assert list(cfgs["config_id"]) == [0, 1]
    by_model = {json.loads(c)["model"]["oi_model"]: i for c, i in zip(cfgs["config"], cfgs["config_id"])}
    rd = rd.sort_values("x")
    # host 0 rows keep A->0, B->1; host 1's B row is remapped 0 -> 1
    assert list(rd["config_id"]) == [by_model["GPflowGPRModel"], by_model["GPflowSGPRModel"], by_model["GPflowSGPRModel"]]


def test_completion_markers_are_run_scoped(tmp_path):
    """A stale _host_complete marker (previous config sharing the store,
    or a run over fewer expert locations) must not satisfy the merge wait
    for the current run."""
    from gpsat_tpu.distributed import (
        clear_host_marker, host_is_complete, mark_host_complete, run_token,
        wait_for_hosts,
    )

    locs = pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 1.0]})
    cfg_a = {"model": {"oi_model": "GPflowGPRModel"}}
    cfg_b = {"model": {"oi_model": "GPflowSGPRModel"}}
    tok_a = run_token(cfg_a, locs)
    tok_b = run_token(cfg_b, locs)
    assert tok_a != tok_b
    # elastic restart: adding a location changes the token
    assert run_token(cfg_a, pd.concat([locs, locs])) != tok_a
    # run_kwargs differences do NOT change it (comparable subset only)
    assert run_token({**cfg_a, "run_kwargs": {"store_path": "z"}}, locs) == tok_a

    p = str(tmp_path / "r.h0.h5")
    mark_host_complete(p, 0, token=tok_a)
    assert host_is_complete(p, token=tok_a)
    assert not host_is_complete(p, token=tok_b)  # stale marker ignored
    with pytest.raises(TimeoutError):
        wait_for_hosts([p], timeout=0.2, poll=0.05, token=tok_b)
    # marker from config A replaced once config B's host finishes
    mark_host_complete(p, 0, token=tok_b)
    wait_for_hosts([p], timeout=1.0, token=tok_b)
    clear_host_marker(p)
    assert not host_is_complete(p)
    clear_host_marker(p)  # idempotent, including on missing files
    clear_host_marker(str(tmp_path / "absent.h5"))

    # pre-token marker (old format, no token column) never satisfies a
    # token wait but still satisfies an untokened check
    with TableStore(p) as store:
        store.put("_host_complete", pd.DataFrame({"process_id": [0]}))
    assert host_is_complete(p)
    assert not host_is_complete(p, token=tok_a)
