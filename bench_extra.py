"""Round-8 optimization measurement harness (bench.py is FROZEN for
driver measurement — all extra instrumentation lives here).

Usage:
  python bench_extra.py --queries dedup_clusters,cross_dup [--reps 3] \
      [--explain plans/r08 --suffix before]

Times each named query with the same methodology as bench.py (noop
sink, fresh DataFrame per rep, round-robin rep order, medians) at
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS, optionally writing
.explain("formatted") for each query to <explain>/<name>_<suffix>.txt.
Backfill queries (backfill_*) are included via bench._backfill_queries
so kernel/join strategies can be profiled under the same harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory to write <name>_<suffix>.txt explains")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None, help="write JSON result here too")
    args = ap.parse_args()

    import bench as benchmod
    import __spark_entry__ as entrymod
    from featuretools_spark.session import get_spark

    names = args.queries.split(",")
    shuf = int(os.environ.get("SPARK_GRAFT_SHUFFLE", 0)) or max(CPUS, 8)
    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=shuf)
    sf = benchmod._sf_label(SF_DIR)
    qs = dict(entrymod.queries())
    qs.update(benchmod._backfill_queries(sf))
    prepare_fn = qs.pop("__prepare__")

    # warm-up identical in spirit to bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    if any(n.startswith("backfill") for n in names):
        prepare_fn(spark, names)
    big = spark.range(1_000_000).selectExpr("id", "id % 97 AS k")
    small = spark.range(97).selectExpr("id AS k", "id * 2 AS v")
    big.join(small.hint("broadcast"), "k").selectExpr("sum(v)").collect()
    big.mapInPandas(lambda it: it, "id long, k long").selectExpr(
        "count(*)").collect()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)

    reps_out = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            reps_out[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    secs = {n: round(_median(v), 3) for n, v in reps_out.items()}
    result = {"sf": sf, "cpus": CPUS, "queries": secs, "reps": reps_out}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
