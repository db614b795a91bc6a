"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "feature_rows_per_sec": ...}.

--scaling: runs the flagship as-of backfill at two parallelism levels
(local[N] and local[4N], subprocesses so each gets a fresh JVM) on the
same input and reports throughput at both + scaling efficiency
(BASELINE.json north rule: efficiency >= 0.8 between N and 4N).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "dfs_depth1",        # flagship: DFS as-of backfill (agg fan-out)
    "per_row_cutoffs",   # per-row cutoff as-of join
    "agg_basic",
    "agg_distinct",
    "multihop",          # 2-hop relationship aggregation
    "direct",            # dimension join pulls
    "sessionize",        # inactivity-gap sessions
    "window_transforms", # lag/diff/cum/rolling at event grain
    "training_window",
]


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([\d.]+)", path)
    return float(m.group(1)) if m else -1.0


def run_once(sf_dir: str, cpus: int, queries=None) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from featuretools_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.range(10).count()  # JVM warm-up
    qs = entrymod.queries()
    names = queries or HEADLINE
    secs, rows = {}, {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        secs[name] = round(time.time() - t0, 3)
        rows[name] = n
    total = round(sum(secs.values()), 3)
    # feature-rows/sec for the flagship backfill: output rows ×
    # feature columns per second (the BASELINE.json metric)
    flag = "dfs_depth1"
    if flag in secs:
        n_cols = len(qs[flag](spark, sf_dir).columns) - 1  # minus key
        frps = round(rows[flag] * n_cols / max(secs[flag], 1e-9), 1)
    else:
        frps = None
    return {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": secs,
        "rows": rows,
        "sf": _sf_label(sf_dir),
        "cpus": cpus,
        "feature_rows_per_sec": frps,
    }


def run_scaling(sf_dir: str, n: int = 8) -> dict:
    """Run the flagship backfill at local[n] and local[4n] in fresh
    JVMs; report throughput at both + efficiency."""
    out = {}
    for cpus in (n, 4 * n):
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single",
             "dfs_depth1,per_row_cutoffs,multihop"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[cpus] = json.loads(line)
    t_n = out[n]["value"]
    t_4n = out[4 * n]["value"]
    # throughput scales as 1/time on identical input
    eff = (t_n / t_4n) / 4.0
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": n,
        "t_n_sec": t_n,
        "t_4n_sec": t_4n,
        "detail": {str(k): v for k, v in out.items()},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif "--single" in sys.argv:
        idx = sys.argv.index("--single")
        names = sys.argv[idx + 1].split(",") if len(sys.argv) > idx + 1 else None
        print(json.dumps(run_once(SF_DIR, CPUS, names)))
    else:
        print(json.dumps(run_once(SF_DIR, CPUS)))
