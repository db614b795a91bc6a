"""Distributed evaluation of BOUNDED-window pandas kernels over a
global ordering (no partition key) — the halo-exchange pattern.

A kernel whose output at row i depends only on rows within a fixed
window around i (savgol_filter: centered window_length//2; rolling
aggregates with gap: trailing window_length+gap-1) does not need the
whole column in one pandas frame: range-partition on the order
columns, ship each partition the few boundary rows it is missing from
its neighbours (the "halo"), run the kernel per partition, and drop
the halo rows from the output.  Interior rows see exactly the same
neighbourhood as the single-frame evaluation; the true sequence edges
live only in the first/last partitions, so edge-mode behaviour
(scipy's mode='interp', rolling min_periods) also matches.

Halo volume is nparts x (before+after) rows — driver-collected and
broadcast, never a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bounded_window_global(
    df: DataFrame,
    prim,
    in_cols: list[str],
    out_col: str,
    order_cols: list[str],
    before: int,
    after: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run ``prim.pandas`` over the global ``order_cols`` ordering with
    a halo of `before` preceding / `after` following rows per chunk.
    Output schema = input schema + out_col(double)."""
    sc = df.sparkSession
    nparts = num_partitions or max(sc.sparkContext.defaultParallelism, 8)

    ordered = (
        df.repartitionByRange(nparts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__bw_pid", F.spark_partition_id())
        # Eager: pin pid assignment across passes; lineage truncation
        # means executor loss fails loudly, never re-samples pids.
        .localCheckpoint(eager=True)
    )

    # ---- pass 1: boundary rows per partition (head `after`, tail
    # `before`), driver-collected: nparts x (before+after) rows -------
    bfields = ordered.schema.fields
    bschema = T.StructType(bfields + [T.StructField("__bw_end", T.StringType())])

    def boundary(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="stable")
        head = pdf.head(after).assign(__bw_end="h") if after else pdf.iloc[:0].assign(__bw_end="h")
        tail = pdf.tail(before).assign(__bw_end="t") if before else pdf.iloc[:0].assign(__bw_end="t")
        return pd.concat([head, tail])

    bounds = (
        ordered.groupBy("__bw_pid").applyInPandas(boundary, bschema).toPandas()
    )
    pids = sorted(bounds["__bw_pid"].unique().tolist()) if len(bounds) else []
    tails = {p: g.drop(columns="__bw_end")
             for p, g in bounds[bounds["__bw_end"] == "t"].groupby("__bw_pid")}
    heads = {p: g.drop(columns="__bw_end")
             for p, g in bounds[bounds["__bw_end"] == "h"].groupby("__bw_pid")}

    # halo BEFORE partition p = last `before` rows of the stream up to
    # p (walk tails in pid order — handles partitions shorter than the
    # halo); halo AFTER p = first `after` rows of the stream past p.
    empty = bounds.drop(columns="__bw_end").iloc[:0]
    halo_before, halo_after = {}, {}
    acc = empty
    for p in pids:
        halo_before[p] = acc.tail(before) if before else empty
        acc = pd.concat([acc, tails.get(p, empty)]).tail(max(before, 1))
    acc = empty
    for p in reversed(pids):
        halo_after[p] = acc.head(after) if after else empty
        acc = pd.concat([heads.get(p, empty), acc]).head(max(after, 1))
    bc = sc.sparkContext.broadcast(
        {p: (halo_before[p], halo_after[p]) for p in pids})

    # ---- pass 2: kernel over chunk + halo, halo rows dropped ---------
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(out_col, T.DoubleType(), True)]
    )
    keep = [f.name for f in df.schema.fields]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["__bw_pid"].iloc[0])
        hb, ha = bc.value.get(pid, (None, None))
        n_b = len(hb) if hb is not None else 0
        parts = [x for x in (hb, pdf, ha) if x is not None and len(x)]
        full = pd.concat(parts, ignore_index=True)
        full = full.sort_values(order_cols, kind="stable")
        full = prim.pandas(full, in_cols, out_col, order_cols)
        own = full.iloc[n_b:n_b + len(pdf)]
        return own[keep + [out_col]]

    return ordered.groupBy("__bw_pid").applyInPandas(run, out_schema)
