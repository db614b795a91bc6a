"""Escalation stress leg (round 6, VERDICT r5 #3 done-criterion).

Runs the dense backfill (64 cutoffs/entity) at >=40M event rows with
strategy="auto" so the pre-flight estimator fires NATURALLY: at 40M
rows the cutoff table is ~25.6M (entity, cutoff) pairs and the join
path's hash-agg state estimate (~7.8 GB at 5 agg features) divided by
the session's 32 shuffle partitions exceeds the local-mode per-task
budget (~37 MB at the default 8g heap), so the first rung raises the
shuffle width instead of flipping strategy. A second leg repeats the
identical plan with the preflight disabled (FT_SPARK_AUTO_PREFLIGHT=0,
static width) for comparison.

JVM peak RSS (VmHWM) is process-wide and MONOTONE, so the escalated
leg runs FIRST: its HWM is its own bound; the static leg's HWM is only
attributable to it where it exceeds leg 1's. Both are reported.

Usage: python tools/stress_escalation.py [--rows 40000000] [--out f]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jvm_peak_rss_gb():
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


def main():
    rows = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--rows"), 40_000_000))
    out_path = next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--out"), None)
    # r7 done-criterion hook: assert the preflight's decision matches
    # the heap this process was launched with ("decline" on the 8g box
    # whose static-width RSS proves the job fits; "escalate" tight-heap)
    expect = next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                   if a == "--expect"), None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ["SPARK_GRAFT_BENCH_ROWS"] = str(rows)
    import bench
    from featuretools_spark import cfm
    from featuretools_spark.session import get_spark

    spark = get_spark("stress_escalation", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench._backfill_queries(rows / 20_000_000)
    qs["__prepare__"](spark, names=["backfill_dense"])

    def reset_width():
        spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(cpus))

    out = {"metric": "escalation_stress", "rows": rows, "cpus": cpus,
           "dense_per_entity": 64, "heap": os.environ.get(
               "SPARK_DRIVER_MEM", "8g"), "legs": {}}

    # Leg 1 — strategy="auto", preflight ON: the estimator must fire
    # the width rung, and the run must complete with bounded RSS.
    os.environ.pop("FT_SPARK_AUTO_PREFLIGHT", None)
    reset_width()
    t0 = time.time()
    qs["__run_dense__"](spark, "auto").write.format("noop") \
        .mode("overwrite").save()
    out["legs"]["auto_escalated"] = {
        "secs": round(time.time() - t0, 2),
        "jvm_peak_rss_gb": _jvm_peak_rss_gb(),
        "preflight": dict(cfm.LAST_PREFLIGHT),
        "parts_after_run": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    print(json.dumps({"auto_escalated": out["legs"]["auto_escalated"]}),
          flush=True)
    if expect:
        pf = out["legs"]["auto_escalated"]["preflight"]
        fired = (pf.get("parts_after", 0) or 0) > (
            pf.get("parts_before", 0) or 0) or pf["strategy"] == "sortmerge"
        want = expect == "escalate"
        if fired != want:
            print(f"EXPECT-FAIL: wanted {expect}, preflight said "
                  f"{pf['reason']}", flush=True)
            sys.exit(2)
        print(f"EXPECT-OK: {expect}", flush=True)

    # Leg 2 — identical plan, preflight OFF, static session width.
    # --skip-static: on tight-heap runs the static leg is exactly the
    # configuration the escalation exists to prevent (GC-thrash);
    # don't run it, the escalated leg's completion is the evidence.
    if "--skip-static" in sys.argv:
        print(json.dumps(out))
        if out_path:
            with open(out_path, "w") as f:
                json.dump(out, f, indent=1)
        return
    os.environ["FT_SPARK_AUTO_PREFLIGHT"] = "0"
    reset_width()
    t0 = time.time()
    qs["__run_dense__"](spark, "auto").write.format("noop") \
        .mode("overwrite").save()
    out["legs"]["static_width"] = {
        "secs": round(time.time() - t0, 2),
        "jvm_peak_rss_gb": _jvm_peak_rss_gb(),
        "preflight": dict(cfm.LAST_PREFLIGHT),
    }
    os.environ.pop("FT_SPARK_AUTO_PREFLIGHT", None)
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
