"""Measure the join-path hash-agg's REAL per-pair memory so the
strategy="auto" preflight estimate is calibrated, not guessed
(round-7 VERDICT #2: the r6 default budget + 304 B/pair estimate
over-fired a 22% width premium on a workload whose static-width RSS
proved it fit).

Runs the dense backfill (64 cutoffs/entity) at static width with the
preflight disabled, then walks the AQE-final executed plan and reads
every HashAggregate node's "peak memory" SQLMetric (Spark publishes
it as a max-over-tasks sizing metric). The widest aggregate divided
by its share of (entity, cutoff) pairs is the measured bytes/pair.

Usage: python tools/calibrate_preflight.py [--rows 10000000] [--out f]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scala_seq(jseq):
    it = jseq.iterator()
    while it.hasNext():
        yield it.next()


def _walk(node):
    """Yield every physical node, descending through AQE wrappers."""
    yield node
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _walk(node.executedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _walk(node.plan())
        return
    for ch in _scala_seq(node.children()):
        yield from _walk(ch)
    # reused exchanges / subqueries hold their child via .child()
    if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        try:
            yield from _walk(node.child())
        except Exception:
            pass


def _peak_memories(df):
    """[(nodeName, peak_memory_bytes)] for every hash aggregate in the
    executed plan (call AFTER an action)."""
    out = []
    plan = df._jdf.queryExecution().executedPlan()
    for node in _walk(plan):
        nm = node.nodeName()
        if "HashAggregate" not in nm and "SortAggregate" not in nm:
            continue
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "peakMemory":
                out.append((nm, int(kv._2().value())))
    return out


def main():
    rows = int(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--rows"), 10_000_000))
    out_path = next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--out"), None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ["SPARK_GRAFT_BENCH_ROWS"] = str(rows)
    os.environ["FT_SPARK_AUTO_PREFLIGHT"] = "0"
    import bench
    from featuretools_spark.session import get_spark

    spark = get_spark("calibrate_preflight", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench._backfill_queries(rows / 20_000_000)
    qs["__prepare__"](spark, names=["backfill_dense"])
    # a .write action runs a SEPARATE QueryExecution whose metrics
    # never land on df's plan — wrap in a scalar count instead: its
    # executed plan CONTAINS the full backfill subtree, and collect()
    # executes that very QueryExecution, so the metrics are live
    df = qs["__run_dense__"](spark, "join").groupBy().count()
    df.collect()

    n_entities = max(rows // 100, 10)
    n_pairs = n_entities * 64
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    peaks = _peak_memories(df)
    # the preflight sizes the FINAL (entity, cutoff) aggregate — the
    # widest hash-agg in the plan; max-over-tasks x parts bounds its
    # total state from above (uniform synthetic keys -> max ~ mean)
    widest = max((p for _, p in peaks), default=0)
    per_pair = widest * parts / n_pairs if n_pairs else None
    out = {
        "metric": "preflight_calibration", "rows": rows, "cpus": cpus,
        "n_pairs": n_pairs, "parts": parts,
        "agg_peaks_bytes": peaks,
        "widest_peak_per_task_bytes": widest,
        "measured_bytes_per_pair_upper": round(per_pair, 1),
        "n_agg_feats": 5,
        "note": "peakMemory is max-over-tasks; x parts / n_pairs is an "
                "UPPER bound on per-pair state (hash map growth is "
                "power-of-2, so the bound includes unused capacity)",
    }
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
