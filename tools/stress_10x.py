"""10x stress probe (round 5, VERDICT #5): the flagship backfill and
the dense-cutoff backfill at 20M rows (sf1-equivalent — 10x the
per-round bench input) with 64 cutoffs/entity on the dense leg.

Evidence target: the join strategy's cutoff x event row expansion and
the kernel's partition-bounded memory both hold at the next order of
magnitude. Records wall time per query plus the JVM's peak RSS
(VmHWM of the SparkSubmit process — in local mode that single JVM
holds every executor thread, so its high-water mark bounds all
executor memory).

Usage: python tools/stress_10x.py [--rows 20000000]
       [--reps 1] [--queries backfill_seq,backfill_dense,...]
(the dense legs use bench's 64-cutoffs-per-entity table)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jvm_peak_rss_gb():
    """VmHWM of the newest java child of this process tree."""
    try:
        import subprocess
        pids = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True).stdout.split()
        best = 0
        for pid in pids:
            try:
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmHWM"):
                            best = max(best, int(line.split()[1]))
            except OSError:
                pass
        return round(best / 1024 / 1024, 2) if best else None
    except Exception:
        return None


def main():
    rows = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--rows"), 20_000_000))
    reps = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--reps"), 1))
    names = next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                  if a == "--queries"),
                 "backfill_seq,backfill_seq_sm,backfill_dense,"
                 "backfill_dense_sm").split(",")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ["SPARK_GRAFT_BENCH_ROWS"] = str(rows)
    import bench
    from featuretools_spark.session import get_spark

    spark = get_spark("stress10x", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench._backfill_queries(rows / 20_000_000)
    qs["__prepare__"](spark, names=names)

    out = {"rows": rows, "cpus": cpus, "dense_per_entity": 64,
           "queries": {}}
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, None).write.format("noop") \
                .mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out["queries"][name] = {
            "secs": ts, "jvm_peak_rss_gb": _jvm_peak_rss_gb(),
        }
        print(json.dumps({name: out["queries"][name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
