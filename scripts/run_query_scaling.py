#!/usr/bin/env python
"""Scaling evidence for the heaviest CATALOG queries (the analysis-operator
tier): each query runs at CPU-pinned local[lo] vs local[hi] over the same
sf directory, fresh JVM per trial, best-of-N per level, and the per-query
efficiency table is appended to BENCH.md.

Methodology matches run_scaling.py / run_curate_scaling.py exactly:
``taskset`` pinning (an unpinned local[N] JVM rides far more than N
cores), the constant-plan env pins (file-split size and shuffle
partitioning are cluster constants on a real N- vs 4N-executor cluster),
best-of-N because ambient contention on a shared host only ever slows a
trial, and the timed region is the query's own computation (noop sink;
session startup and scan warm-up excluded — see query_job.py).

Interpretation note recorded with the table: queries whose catalog-scale
routing deliberately short-circuits dimension-sized work to the driver
(exact-BFS closeness under the size-routed dispatcher) are NOT expected
to scale at this input size — that is the documented design, and the
numbers make it visible instead of hiding it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "q_samr",
    "q_graph_closeness",
    "q_impute_knn",
    "q_graph_summary",
    "q_graph_triangles",
]


def run_one(query: str, cores: int, sf_dir: str, trials: int) -> dict:
    pin = ["taskset", "-c", f"0-{cores - 1}"] if cores > 1 else ["taskset", "-c", "0"]
    env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "SPARK_GRAFT_MIN_SCAN_PARTITIONS": "40",
        "SPARK_GRAFT_SHUFFLE_PARTITIONS": "16",
        "SPARK_GRAFT_AQE_COALESCE": "false",
    }
    best = None
    for _ in range(trials):
        out = subprocess.run(
            pin + [
                sys.executable, os.path.join(REPO, "scripts", "query_job.py"),
                "--query", query, "--cores", str(cores), "--sf-dir", sf_dir,
            ],
            capture_output=True, text=True, check=True, cwd=REPO, env=env,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["seconds"] < best["seconds"]:
            best = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", default="1,4")  # pairs above 4 cores
    # measure the hypervisor on this host's shared vCPUs (BENCH.md)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))
    queries = [q for q in args.queries.split(",") if q]

    rows = []
    for q in queries:
        b_lo = run_one(q, lo, args.sf_dir, args.trials)
        b_hi = run_one(q, hi, args.sf_dir, args.trials)
        assert b_lo["rows"] == b_hi["rows"], (q, b_lo, b_hi)
        eff = (b_lo["seconds"] / b_hi["seconds"]) / (hi / lo)
        rows.append((q, b_lo, b_hi, round(eff, 3)))
        print(json.dumps({"query": q, "s_lo": b_lo["seconds"],
                          "s_hi": b_hi["seconds"], "eff": round(eff, 3),
                          "rows": b_lo["rows"]}))

    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Heaviest-catalog-query scaling (local[{lo}] vs "
            f"local[{hi}] CPU-pinned, {args.sf_dir.rstrip('/').rsplit('/', 1)[-1]}, "
            f"best of {args.trials}, constant-plan pins, noop-sink timing)\n\n"
            f"| query | s @{lo}c | s @{hi}c | speedup | efficiency /{hi // lo} | rows |\n"
            f"|---|---|---|---|---|---|\n"
        )
        for q, b_lo, b_hi, eff in rows:
            sp = round(b_lo["seconds"] / b_hi["seconds"], 2)
            f.write(
                f"| {q} | {b_lo['seconds']} | {b_hi['seconds']} | {sp}x "
                f"| {eff} | {b_lo['rows']} |\n"
            )
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
