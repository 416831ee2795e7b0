"""Multi-host (DCN) execution of the local-expert sweep.

The reference is strictly single-process (SURVEY.md §2.9: the serial
expert loop, ref: GPSat/local_experts.py:930-1260, with "scale-out" =
running multiple configs by hand). The TPU-native scale-out follows the
standard JAX multi-controller model (docs/multihost.md is the design this
file implements):

1. every host runs the SAME program and calls :func:`init_distributed`
   (``jax.distributed.initialize``) so the runtime knows the process
   topology — mandatory on real TPU pod slices, where ``jax.devices()``
   only returns the global chip list after initialization;
2. the expert-location table is partitioned deterministically with no
   coordination: host ``h`` keeps rows whose position satisfies
   ``row_index % num_processes == process_id``;
3. each host runs the standard batched engine over a mesh of its LOCAL
   devices. Experts are independent, so the compiled per-shard program is
   byte-identical to the single-host one and **no collectives cross DCN
   during optimization** — the interconnect carries nothing but process
   setup and the final result fetch, which is the optimal mapping for
   this workload (the scaling-book recipe degenerates to pure data
   parallelism over the 'experts' axis);
4. results land in PER-HOST store files (HDF5 has no concurrent
   writers): ``results.h5`` -> ``results.h0.h5``, ``results.h1.h5``, …
   :func:`merge_stores` combines them into the canonical single-file
   layout afterwards; restart semantics are unchanged (each host skips
   its own already-run experts via its ``run_details`` ledger).

CLI (the reference's JSON-config idiom, ref: examples/local_expert_oi.py):

    python -m gpsat_tpu.distributed <config.json> \
        --coordinator <host:port> --num-processes H --process-id h \
        [--merge] [--platform cpu] [--x64] [--devices-per-process N]

On a TPU pod slice the three distributed flags can be omitted — JAX
auto-detects them from the TPU environment. ``--merge`` makes process 0
wait for every host's completion marker and write the merged store.
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import time
from typing import List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.utils.misc import cprint

_COMPLETE_TABLE = "_host_complete"


# --------------------------------------------------------------------------
# process topology
# --------------------------------------------------------------------------

def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> tuple:
    """Initialize the JAX distributed runtime (idempotent).

    On TPU pod slices all arguments are auto-detected from the
    environment; on CPU/GPU clusters they must be given. Returns
    ``(process_id, num_processes)`` as reported by JAX after
    initialization, or ``(0, 1)`` when running single-process with no
    coordinator configured.
    """
    import jax

    if coordinator_address is None and num_processes is None and not _tpu_pod_env():
        return jax.process_index(), jax.process_count()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        # already initialized (idempotency for notebook / test reuse)
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()


def _tpu_pod_env() -> bool:
    """Heuristic: running under a MULTI-WORKER TPU pod launcher (which
    provides the coordinator via environment). Single-worker TPU VMs also
    set TPU_WORKER_HOSTNAMES (with one entry), so require >1 worker."""
    if "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def local_mesh():
    """1-D 'experts' mesh over THIS process's addressable devices.

    The multi-host engine shards experts across hosts at the
    orchestration layer (partition_expert_locs), so the compiled program
    only ever spans local devices — zero DCN collectives by construction.
    """
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.local_devices()), axis_names=("experts",))


# --------------------------------------------------------------------------
# expert partitioning + per-host stores
# --------------------------------------------------------------------------

def partition_expert_locs(
    expert_locs: pd.DataFrame, num_processes: int, process_id: int
) -> pd.DataFrame:
    """Deterministic expert partition: row position mod num_processes.

    Positional (not index-label) so every host agrees given the same
    table, with no communication (docs/multihost.md step 2).
    """
    assert 0 <= process_id < num_processes, (process_id, num_processes)
    return expert_locs.iloc[process_id::num_processes].copy()


def host_store_path(store_path: str, process_id: int) -> str:
    """Per-host store file: results.h5 -> results.h0.h5 etc."""
    root, ext = os.path.splitext(store_path)
    return f"{root}.h{process_id}{ext or '.h5'}"


def run_token(config: dict, expert_locs: Optional[pd.DataFrame] = None) -> str:
    """Deterministic token identifying THIS run's work for the completion
    markers, computed identically (no communication) on every host from
    the comparable config subset plus the full pre-partition expert-loc
    table. Markers from a different config sharing the store file, or
    from a run over a smaller expert set (elastic restart that added
    locations), carry a different token and are ignored by the merge wait
    instead of being mistaken for completion.
    """
    import hashlib

    from gpsat_tpu.experts import _comparable_config_str

    h = hashlib.sha1(_comparable_config_str(config).encode())
    if expert_locs is not None:
        h.update(pd.util.hash_pandas_object(expert_locs, index=False).values.tobytes())
    return h.hexdigest()


def mark_host_complete(store_path: str, process_id: int, token: str = "") -> None:
    """Write the completion marker process 0's merge waits on."""
    with TableStore(store_path) as store:
        store.put(
            _COMPLETE_TABLE,
            pd.DataFrame({
                "process_id": [process_id], "token": [token],
                "datetime": [pd.Timestamp.now().isoformat()],
            }),
        )


def clear_host_marker(store_path: str) -> None:
    """Drop a stale completion marker before starting (new) work."""
    if not os.path.exists(store_path):
        return
    with TableStore(store_path) as store:
        if _COMPLETE_TABLE in store:
            store.delete(_COMPLETE_TABLE)


def host_is_complete(store_path: str, token: str = "") -> bool:
    if not os.path.exists(store_path):
        return False
    try:
        with TableStore(store_path, mode="r") as store:
            if _COMPLETE_TABLE not in store:
                return False
            if not token:
                return True
            marker = store.get(_COMPLETE_TABLE)
            # pre-token markers (no column) never satisfy a token wait
            if "token" not in marker.columns:
                return False
            return bool((marker["token"].astype(str) == token).any())
    except OSError:
        return False  # mid-write


def wait_for_hosts(paths: Sequence[str], timeout: float = 600.0, poll: float = 0.5, token: str = "") -> None:
    """Block until every per-host store carries its completion marker.

    File-based (no collectives): works identically on CPU test clusters
    and TPU pods sharing a filesystem, and tolerates hosts finishing at
    wildly different times. With ``token``, only markers written for the
    SAME run (see :func:`run_token`) count — a stale marker left in a
    reused store file does not release the wait.
    """
    t0 = time.monotonic()
    while True:
        missing = [p for p in paths if not host_is_complete(p, token=token)]
        if not missing:
            return
        if time.monotonic() - t0 > timeout:
            raise TimeoutError(f"hosts not complete after {timeout}s: {missing}")
        time.sleep(poll)


# --------------------------------------------------------------------------
# merge
# --------------------------------------------------------------------------

def merge_stores(
    host_paths: Union[str, Sequence[str]],
    out_path: str,
    sort: bool = True,
    overwrite: bool = False,
) -> List[str]:
    """Merge per-host result stores into one canonical store.

    host_paths: list of files or a glob pattern. Config tables
    (``oi_config*``) are deduplicated on their comparable subset (every
    host stores the same config); all other tables are concatenated and,
    with ``sort=True``, ordered by their index columns (+ ``_dim_*`` and
    prediction-location columns) so the merged table is a deterministic
    function of the result set, independent of host count — a 2-host run
    merges to the exact table a single-process run produces.

    Returns the list of merged table names.
    """
    from gpsat_tpu.experts import _comparable_config_str

    if isinstance(host_paths, str):
        host_paths = sorted(_glob.glob(host_paths))
    host_paths = list(host_paths)
    assert host_paths, "merge_stores: no host stores given"
    if os.path.exists(out_path):
        assert overwrite, f"out_path exists: {out_path} (pass overwrite=True)"
        os.remove(out_path)

    # Global config renumbering: distinct comparable configs get ids in
    # first-seen order across hosts, and every host's config_id column is
    # remapped through its own old-id -> new-id table BEFORE concatenation
    # (hosts that ran different config subsets number them differently, so
    # raw config_id values are only meaningful per host).
    seen: dict = {}  # comparable-config key -> merged config_id
    config_rows: dict = {}  # config-table name -> {key: row}

    # table -> list of DataFrames (with index-col metadata preserved)
    frames: dict = {}
    index_cols: dict = {}
    for p in host_paths:
        with TableStore(p, mode="r") as store:
            tables = [t for t in store.keys() if t != _COMPLETE_TABLE]
            # host's per-suffix old->new config_id maps
            id_maps: dict = {}
            for t in tables:
                if not t.startswith("oi_config"):
                    continue
                suffix = t[len("oi_config"):]
                cfg_df = store.select(t, set_index=False)
                remap = {}
                for _, row in cfg_df.iterrows():
                    key = _comparable_config_str(json.loads(row["config"]))
                    if key not in seen:
                        seen[key] = len(seen)
                    config_rows.setdefault(t, {}).setdefault(key, {**row, "config_id": seen[key]})
                    remap[int(row["config_id"])] = seen[key]
                id_maps[suffix] = remap
            for t in tables:
                if t.startswith("oi_config"):
                    continue
                df = store.select(t, set_index=False)
                if "config_id" in df.columns and id_maps:
                    # longest config-table suffix that matches this table
                    match = max(
                        (s for s in id_maps if t.endswith(s)), key=len, default=None
                    )
                    if match is not None:
                        df["config_id"] = df["config_id"].map(
                            lambda i: id_maps[match].get(int(i), int(i))
                        )
                idx = json.loads(store._h5[t].attrs["index_cols"])
                frames.setdefault(t, []).append(df)
                index_cols.setdefault(t, idx)
    for t, rows in config_rows.items():
        frames[t] = [pd.DataFrame(sorted(rows.values(), key=lambda r: r["config_id"]))]
        index_cols.setdefault(t, [])

    merged_tables = []
    with TableStore(out_path) as store:
        for t, dfs in frames.items():
            df = pd.concat(dfs, ignore_index=True)
            if sort and not t.startswith("oi_config"):
                sort_cols = [c for c in index_cols[t] if c in df.columns]
                sort_cols += sorted(c for c in df.columns if c.startswith("_dim_"))
                sort_cols += sorted(c for c in df.columns if c.startswith("pred_loc_"))
                if sort_cols:
                    df = df.sort_values(sort_cols, kind="stable").reset_index(drop=True)
            idx = [c for c in index_cols[t] if c in df.columns]
            store.append(t, df.set_index(idx) if idx else df)
            merged_tables.append(t)
    return merged_tables


# --------------------------------------------------------------------------
# the distributed sweep
# --------------------------------------------------------------------------

def run_distributed(
    config: dict,
    *,
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
    coordinator_address: Optional[str] = None,
    merge: bool = False,
    merge_timeout: float = 600.0,
):
    """Run one OI experiment config across hosts (this process's share).

    config: the reference-schema experiment dict (data / model /
    locations / pred_loc / run_kwargs). Each host runs its expert
    partition on its local-device mesh and writes
    ``host_store_path(store_path, h)``; with merge=True, process 0 waits
    for all hosts and writes the canonical merged store at ``store_path``.
    """
    from gpsat_tpu.experts import LocalExpertOI

    pid, nproc = init_distributed(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    cprint(f"[distributed] process {pid} / {nproc}", c="OKBLUE")

    config = dict(config)
    config.pop("comment", None)
    config.pop("misc", None)
    run_kwargs = dict(config.pop("run_kwargs", {}))
    store_path = run_kwargs.pop("store_path")
    my_store = host_store_path(store_path, pid) if nproc > 1 else store_path

    oi = LocalExpertOI(
        expert_loc_config=config.get("locations"),
        data_config=config.get("data"),
        model_config=config.get("model"),
        pred_loc_config=config.get("pred_loc"),
    )
    token = run_token(config, oi.expert_locs)  # pre-partition: hosts agree
    if nproc > 1:
        clear_host_marker(my_store)
        oi.expert_locs = partition_expert_locs(oi.expert_locs, nproc, pid)
    run_kwargs.setdefault("mesh", local_mesh())
    oi.run(store_path=my_store, **run_kwargs)

    if nproc > 1:
        mark_host_complete(my_store, pid, token=token)
        if merge and pid == 0:
            paths = [host_store_path(store_path, h) for h in range(nproc)]
            wait_for_hosts(paths, timeout=merge_timeout, token=token)
            merge_stores(paths, store_path, overwrite=True)
            cprint(f"[distributed] merged {nproc} host stores -> {store_path}", c="OKGREEN")
    return my_store


# --------------------------------------------------------------------------
# multiprocess dry run (driver/CI validation without a real pod)
# --------------------------------------------------------------------------

def _dryrun_worker(process_id: int, num_processes: int, port: int) -> None:
    """One host of the multiprocess dry run: join the coordinator, run one
    sharded engine step on the local-device mesh, report."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, nproc = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.parallel.batching import TileBatch
    from gpsat_tpu.parallel.engine import make_batched_runner, run_tile_batch

    mesh = local_mesh()
    n_local = int(mesh.devices.size)
    dtype = np.float64 if jax.config.read("jax_enable_x64") else np.float32
    rng = np.random.default_rng(pid)
    B, N, P, D = 2 * n_local, 64, 8, 2
    X = rng.uniform(0, 4, size=(B, N, D)).astype(dtype)
    y = (np.sin(X[..., 0]) + 0.1 * rng.normal(size=(B, N))).astype(dtype)
    batch = TileBatch(
        X=X, y=y, mask=np.ones((B, N), dtype=dtype),
        Xnew=rng.uniform(0, 4, size=(B, P, D)).astype(dtype),
        pred_mask=np.ones((B, P), dtype=dtype),
        obs_mean=np.zeros(B, dtype=dtype),
        expert_index=np.arange(B), num_obs=np.full(B, N),
    )
    core = make_gpr_core(jitter=1e-5)
    runner = make_batched_runner(core, max_iter=3, tol_grad=1e-3, tol_f=1e-6, mesh=mesh)
    res = run_tile_batch(batch, {"likelihood_variance": 0.1}, runner, core, mesh=mesh)
    assert np.isfinite(res["objective"]).all() and np.isfinite(res["f_mean"]).all()
    print(
        f"dryrun host {pid}/{nproc}: OK — {len(res['expert_index'])} experts on "
        f"{n_local} local devices (global {len(jax.devices())})",
        flush=True,
    )


def dryrun_multiprocess(n_processes: int = 2, devices_per_process: int = 2, timeout: float = 300.0) -> None:
    """Spawn n_processes real OS processes, join them via
    jax.distributed.initialize on a local coordinator, and run one sharded
    engine step per host — the multi-host analogue of
    __graft_entry__.dryrun_multichip, runnable on any CPU machine."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(n_processes):
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_process}"
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        code = (
            f"from gpsat_tpu.distributed import _dryrun_worker; "
            f"_dryrun_worker({pid}, {n_processes}, {port})"
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code], env=env, cwd=repo_root,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    fail = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=timeout)
        print(out, end="")
        if p.returncode != 0:
            fail.append(pid)
    if fail:
        raise RuntimeError(f"dryrun_multiprocess: processes failed: {fail}")


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser(
        prog="python -m gpsat_tpu.distributed",
        description="multi-host local-expert OI (JSON config, one process per host)",
    )
    ap.add_argument("config", help="experiment JSON (single config or list)")
    ap.add_argument("--coordinator", default=None, help="coordinator host:port (process 0's address)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--merge", action="store_true", help="process 0 merges host stores at the end")
    ap.add_argument("--merge-timeout", type=float, default=600.0)
    ap.add_argument("--platform", default=None, help="force a JAX platform (e.g. cpu) before device init")
    ap.add_argument("--x64", action="store_true", help="enable float64")
    ap.add_argument(
        "--devices-per-process", type=int, default=None,
        help="virtual CPU device count (testing; sets xla_force_host_platform_device_count)",
    )
    args = ap.parse_args(argv)

    if args.devices_per_process:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices_per_process}"
            ).strip()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from gpsat_tpu.local_expert_oi import get_local_expert_oi_configs

    configs = get_local_expert_oi_configs(args.config)
    for i, cfg in enumerate(configs):
        cprint(f"--- distributed OI config {i + 1} / {len(configs)} ---", c="OKBLUE")
        run_distributed(
            cfg,
            process_id=args.process_id,
            num_processes=args.num_processes,
            coordinator_address=args.coordinator,
            merge=args.merge,
            merge_timeout=args.merge_timeout,
        )


if __name__ == "__main__":
    main()
