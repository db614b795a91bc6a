"""Relative-tolerance recheck for queries whose sf1 gate mismatches
are float round-at-4-decimals boundary straddles (round 6).

The driver gate (and tools/check_oracle.py, which mimics it) rounds
DOUBLE values to 4 DECIMALS before comparing. At sf0.01 the big
aggregates are ~1e5, so 4 decimals = 9 significant digits — stable.
At sf1 (10x) sums reach ~1e8, so 4 decimals demands 12 significant
digits — beyond what float64 guarantees across ENGINES and SUMMATION
ORDERS (Spark partial aggregation vs DuckDB streaming). A value that
lands within ~1e-11 relative of a 0.00005 boundary can round either
way; that is a property of the comparison, not of either engine.

This script re-runs the named queries and their oracles at a given
SF and compares every float with RELATIVE tolerance instead: a row
counts as a mismatch only if |spark - duck| > rtol * max(|spark|,
|duck|, 1). With rtol=1e-9 every genuine engine bug the absolute
gate can catch is still caught (the observed boundary flips are
~1e-11 relative), so 0 mismatches here + boundary flips there =
precision artifact, proven.

Usage: python tools/recheck_reltol.py /tmp/sf1 agg_basic,dfs_depth2 \
    [--rtol 1e-9]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from featuretools_spark.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries")
    ap.add_argument("--rtol", type=float, default=1e-9)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("reltol", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{args.sf_dir}/{t}.parquet'")

    qs, oras = entrymod.queries(), entrymod.oracle_sql()
    report = {"metric": "reltol_recheck", "sf_dir": args.sf_dir,
              "rtol": args.rtol, "queries": {}}
    bad_any = False
    for name in args.queries.split(","):
        sdf = qs[name](spark, args.sf_dir)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(r[c] for c in scols) for r in sdf.collect())
        od = con.execute(oras[name])
        onames = [d[0] for d in od.description]
        ocols = sorted(onames)
        orows = sorted(
            tuple(dict(zip(onames, row))[c] for c in ocols)
            for row in od.fetchall())
        assert scols == ocols and len(srows) == len(orows), name
        mism = 0
        worst = 0.0
        for a, b in zip(srows, orows):
            for va, vb in zip(a, b):
                if isinstance(va, float) or isinstance(vb, float):
                    fa, fb = float(va), float(vb)
                    if math.isnan(fa) and math.isnan(fb):
                        continue
                    rel = abs(fa - fb) / max(abs(fa), abs(fb), 1.0)
                    worst = max(worst, rel)
                    if rel > args.rtol:
                        mism += 1
                elif va != vb:
                    mism += 1
        report["queries"][name] = {
            "rows": len(srows), "mismatches": mism,
            "worst_rel_diff": worst,
        }
        bad_any |= mism > 0
        print(f"{name}: rows={len(srows)} rel-mismatches={mism} "
              f"worst_rel={worst:.2e}", file=sys.stderr)
    if args.out:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, args.out), "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))
    sys.exit(1 if bad_any else 0)


if __name__ == "__main__":
    main()
