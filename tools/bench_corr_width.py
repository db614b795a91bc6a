"""Width-scaling benchmark for remove_highly_correlated_features'
two correlation strategies (round 6 — VERDICT r5 stretch: 'benchmark
the distributed-corr variant at 1k columns').

The pairwise path builds n(n-1)/2 F.corr aggregate expressions in ONE
plan — optimal when narrow, quadratic PLAN size when wide (1024
columns = 523,776 expressions; Catalyst/codegen cost explodes long
before the data does). The gram path is O(1) plan size: one
mapInArrow stage computing four p x p GEMM partials per partition +
a treeReduce. This harness times both over the same synthetic matrix
at increasing widths (pairwise only up to its practical ceiling) and
prints one JSON dict.

Usage: python tools/bench_corr_width.py [--rows 100000] \
    [--widths 16,64,256,1024] [--out BENCH/corr_width_r6.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from featuretools_spark.encode import _corr_matrix_gram  # noqa: E402
from featuretools_spark.session import get_spark  # noqa: E402


def make_matrix(spark, rows: int, width: int):
    """Deterministic wide matrix: column j = hash-derived pseudo-noise
    plus a shared latent factor so correlations are non-trivial.
    Built JVM-side (no driver data) and checkpointed to parquet so
    both strategies read the same scan."""
    from pyspark.sql import functions as F

    df = spark.range(rows)
    lat = (F.sin(F.col("id") * 0.001) * 10).alias("_lat")
    df = df.select("id", lat)
    cols = [
        (F.sin(F.col("id") * (0.37 + 0.01 * j)) * 5
         + F.col("_lat") * (j % 7) * 0.2).alias(f"c{j}")
        for j in range(width)
    ]
    out = df.select(*cols)
    path = f"/tmp/corr_bench_{rows}x{width}.parquet"
    # check the _SUCCESS marker, not the directory: an interrupted
    # write leaves a partial dir that then fails schema inference
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def time_gram(df, cols):
    t0 = time.time()
    _corr_matrix_gram(df, cols)
    return round(time.time() - t0, 3)


def time_pairwise(df, cols):
    from pyspark.sql import functions as F
    t0 = time.time()
    aggs = [
        F.corr(F.col(cols[i]), F.col(cols[j])).alias(f"c_{i}_{j}")
        for i in range(len(cols)) for j in range(i + 1, len(cols))
    ]
    df.agg(*aggs).collect()
    return round(time.time() - t0, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--widths", default="16,64,256,1024")
    ap.add_argument("--pairwise-max", type=int, default=64,
                    help="widest matrix the pairwise path is timed at")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("corr_width", master="local[32]",
                      shuffle_partitions=32)
    res = {"metric": "corr_width_scaling", "rows": args.rows,
           "legs": []}
    for width in (int(w) for w in args.widths.split(",")):
        df = make_matrix(spark, args.rows, width)
        cols = df.columns
        leg = {"width": width, "gram_sec": time_gram(df, cols)}
        if width <= args.pairwise_max:
            leg["pairwise_sec"] = time_pairwise(df, cols)
        res["legs"].append(leg)
        print(json.dumps(leg), file=sys.stderr)
    if args.out:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, args.out), "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
