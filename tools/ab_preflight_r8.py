"""Round-8 settlement of the r7 preflight decline-path premium
(VERDICT r7 "What's wrong" #1 / next-round #2).

r7 recorded the auto-ON-but-declining leg 65% slower than the
preflight-OFF static leg at the 40M dense stress shape — measured
with ONE rep per leg in fixed order, exactly the non-interleaved
protocol r6 proved untrustworthy. This tool re-measures under the
honest protocol:

- both legs run in the SAME JVM on the SAME prepared inputs;
- legs ALTERNATE order per rep ((auto, off), (off, auto), ...) so
  host drift lands on both equally;
- >= 3 reps per leg, medians reported;
- the suspected culprit — the preflight's `base_keys.count()` job —
  is additionally timed on its own, per rep.

Usage: python tools/ab_preflight_r8.py [--rows 40000000] [--reps 3]
       [--out BENCH/ab_preflight_r8.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def main():
    rows = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--rows"), 40_000_000))
    reps = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--reps"), 3))
    out_path = next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--out"), None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ["SPARK_GRAFT_BENCH_ROWS"] = str(rows)
    import bench
    from featuretools_spark import cfm
    from featuretools_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("ab_preflight_r8", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench._backfill_queries(rows / 20_000_000)
    qs["__prepare__"](spark, names=["backfill_dense"])

    def reset_width():
        spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(cpus))

    def leg(mode):
        if mode == "auto_on":
            os.environ.pop("FT_SPARK_AUTO_PREFLIGHT", None)
        else:
            os.environ["FT_SPARK_AUTO_PREFLIGHT"] = "0"
        reset_width()
        spark.sparkContext.setJobDescription(f"ab_preflight {mode}")
        t0 = time.time()
        qs["__run_dense__"](spark, "auto").write.format("noop") \
            .mode("overwrite").save()
        dt = round(time.time() - t0, 2)
        pf = dict(cfm.LAST_PREFLIGHT)
        spark.sparkContext.setJobDescription(None)
        return dt, pf

    # isolated timing of the preflight's own count job on the same
    # cutoff frame the decline path counts
    def count_job():
        cuts_df = spark.read.parquet(
            f"/tmp/ft_bench_densecuts_{rows}_512")
        t0 = time.time()
        n = cuts_df.select("entity_id", "time").distinct().count()
        return round(time.time() - t0, 2), n

    times = {"auto_on": [], "preflight_off": []}
    pfs = []
    count_times = []
    for rep in range(reps):
        order = (("auto_on", "preflight_off") if rep % 2 == 0
                 else ("preflight_off", "auto_on"))
        for mode in order:
            dt, pf = leg(mode)
            times["auto_on" if mode == "auto_on"
                  else "preflight_off"].append(dt)
            if mode == "auto_on":
                pfs.append(pf)
            print(json.dumps({"rep": rep, "mode": mode, "secs": dt}),
                  flush=True)
        ct, nc = count_job()
        count_times.append(ct)
        print(json.dumps({"rep": rep, "count_job_secs": ct, "n": nc}),
              flush=True)
    os.environ.pop("FT_SPARK_AUTO_PREFLIGHT", None)

    out = {
        "metric": "ab_preflight_decline_premium",
        "rows": rows, "cpus": cpus, "reps": reps,
        "protocol": "same JVM, alternated leg order per rep, medians",
        "auto_on_secs": times["auto_on"],
        "preflight_off_secs": times["preflight_off"],
        "auto_on_median": _median(times["auto_on"]),
        "preflight_off_median": _median(times["preflight_off"]),
        "premium_median_ratio": round(
            _median(times["auto_on"]) / _median(times["preflight_off"]),
            3),
        "count_job_secs": count_times,
        "preflight_decisions": pfs[:1],
    }
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
