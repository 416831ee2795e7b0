"""Drive N bench_pipeline.py samples in fresh subprocesses, logging each
JSON row (now incl. phases_s / host_s / device_fetch_s / stall_exits) to
stdout — the raw material for BENCH_PIPELINE_rNN.json.

Fresh interpreter per sample: backend-init failure is sticky within a
process, and this also matches the r3/r4 sampling methodology (each
sample pays tunnel dial; the persistent compile cache still hits).

Usage: python tools/run_pipeline_samples.py [n_samples] [per_sample_timeout_s]
           [--ab KEY=VAL]

With --ab, each sample becomes an interleaved A/B pair (A: base env,
B: base env + KEY=VAL) so tunnel drift hits both lanes equally — the
only comparison method that survives the 40-800 s relay variance.
"""

import json
import os
import subprocess
import sys
import time

args = [a for a in sys.argv[1:]]
ab = None
if "--ab" in args:
    i = args.index("--ab")
    ab = args[i + 1]
    del args[i : i + 2]
n = int(args[0]) if len(args) > 0 else 5
per_timeout = int(args[1]) if len(args) > 1 else 1200

lanes = [("A", {})] if ab is None else [
    ("A", {}),
    ("B", dict([ab.split("=", 1)])),
]

rows = []
for i in range(n):
    for lane, extra in lanes:
        t0 = time.time()
        env = dict(os.environ, **extra)
        try:
            p = subprocess.run(
                [sys.executable, "bench_pipeline.py"],
                capture_output=True, text=True, timeout=per_timeout, env=env,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("{")), None
            )
            if line:
                row = json.loads(line)
                row["sample"] = i
                if ab:
                    row["lane"] = lane
                rows.append(row)
                print(json.dumps(row), flush=True)
            else:
                err = (p.stderr or "").strip().splitlines()
                print(json.dumps({"sample": i, "lane": lane, "error": "no JSON line",
                                  "tail": err[-3:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"sample": i, "lane": lane,
                              "error": f"timeout {per_timeout}s",
                              "wall_s": round(time.time() - t0, 1)}), flush=True)

if rows:
    def wall(r):
        # wall is embedded in the unit string: "... wall 123.4s incl. ..."
        import re

        m = re.search(r"wall ([0-9.]+)s", r.get("unit", ""))
        return float(m.group(1)) if m else float("inf")

    best = min(rows, key=wall)
    summary = {"summary": True, "n_ok": len(rows),
               "walls_s": [wall(r) for r in rows],
               "best_wall_s": wall(best),
               "best_phases_s": best.get("phases_s"),
               "best_host_s": best.get("host_s"),
               "best_device_fetch_s": best.get("device_fetch_s"),
               "best_device_dispatch_s": best.get("device_dispatch_s"),
               "best_unattributed_s": best.get("unattributed_s"),
               "stall_exits": best.get("stall_exits")}
    if ab:
        summary["ab"] = ab
        for lane, _ in lanes:
            summary[f"walls_{lane}"] = [wall(r) for r in rows if r.get("lane") == lane]
    print(json.dumps(summary), flush=True)
