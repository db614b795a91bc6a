"""Fixed-capacity causal-LM sequence packing (concat-and-slice).

The standard GPT-style batch construction: concatenate every
document's token stream in a deterministic global order and slice
the stream into training rows of exactly ``capacity`` tokens. This
op computes the PLACEMENT — one row per (document, chunk) overlap
with slice offsets — from the length column alone; the downstream
gather that copies token arrays into chunks then touches each token
exactly once. (Emitting placements instead of materialized chunks
keeps the op independent of where the payload lives — tokens,
chars, bytes — and makes it exactly replayable by a SQL oracle.)

The only global computation is an exclusive prefix sum of lengths in
id order. A single global window (ORDER BY id) would serialize onto
one task, so it runs as a segmented scan, the same shape as the
distributed EWM (ewm.py):

  1. range-partition by id, sort within partitions (range
     partitioning guarantees partition i's ids all precede partition
     i+1's);
  2. per-partition length totals -> driver (#partitions values, the
     same bounded-carry pattern as EWM/IVF centroids) -> exclusive
     partition offsets broadcast back via a tiny join;
  3. per-partition window cumsum (parallel across partitions) + the
     partition offset = each doc's global start position.

The result is partitioning-invariant: start positions depend only on
(id, length), so sampling jitter in the range partitioner cannot
change the output (pinned by test). Everything is exact integer
arithmetic — no float anywhere.

No reference analog: featuretools has no batch-construction surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_causal_chunks(
    df: DataFrame, id_col: str, len_col: str, capacity: int,
) -> DataFrame:
    """Placement table for concat-and-slice packing.

    Returns one row per (doc, chunk) overlap, ordered semantics:
      chunk_id   : which capacity-sized training row
      tok_from   : first position of this doc included (inclusive)
      tok_to     : end position (exclusive) — doc slice [tok_from, tok_to)
      chunk_pos  : where the slice begins inside the chunk

    Zero-length docs occupy no stream positions and emit no rows.
    Docs longer than ``capacity`` span multiple chunks (they are
    split, the causal-LM convention, not rejected).

    EXECUTION SEMANTICS (ADVICE r7): this op runs EAGERLY at call
    time — the per-partition totals are collected to the driver and
    the result is localCheckpoint(eager=True)ed so the placement is
    pinned against the range partitioner's sampling nondeterminism.
    The returned DataFrame reads materialized blocks: they are not
    fault-tolerant (recompute = rerun this function) and stay cached
    until the DataFrame is garbage-collected, so write the placement
    out (or drop the reference) promptly rather than holding many
    copies. Plan-shape note: the per-partition cumsum window inserts
    a second exchange (hash on the partition id) after the range
    exchange — the rows moved are (id, len) pairs, so the cost is
    bounded by the id column, not the payload.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    C = F.lit(int(capacity))

    slim = df.select(
        F.col(id_col), F.col(len_col).cast("long").alias("_len"))
    # persist so the totals pass and the placement pass see the SAME
    # physical partitions (the range partitioner samples; two
    # evaluations of the exchange could disagree otherwise)
    ordered = (
        slim.repartitionByRange(F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        totals = ordered.groupBy("_pid").agg(
            F.sum("_len").alias("_tot")).collect()
        acc = 0
        offs = []
        for r in sorted(totals, key=lambda r: r["_pid"]):
            offs.append((r["_pid"], acc))
            acc += int(r["_tot"] or 0)
        spark = df.sparkSession
        off_df = spark.createDataFrame(offs, ["_pid", "_off"]) \
            if offs else spark.createDataFrame([], "_pid int, _off long")

        w = Window.partitionBy("_pid").orderBy(id_col)
        start = (F.col("_off") + F.sum("_len").over(w)
                 - F.col("_len")).alias("_start")
        placed = (
            ordered.join(F.broadcast(off_df), "_pid")
            .select(id_col, "_len", start)
            .filter(F.col("_len") > 0)
            .select(
                id_col, "_len", "_start",
                F.explode(F.sequence(
                    F.floor(F.col("_start") / C),
                    F.floor((F.col("_start") + F.col("_len") - 1) / C),
                )).alias("chunk_id"),
            )
        )
        tok_from = F.greatest(
            F.lit(0).cast("long"), F.col("chunk_id") * C - F.col("_start"))
        tok_to = F.least(
            F.col("_len"), (F.col("chunk_id") + 1) * C - F.col("_start"))
        out = placed.select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            tok_from.cast("long").alias("tok_from"),
            tok_to.cast("long").alias("tok_to"),
            (F.col("_start") + tok_from - F.col("chunk_id") * C)
            .cast("long").alias("chunk_pos"),
        )
        # materialization boundary: the placement is cheap relative
        # to downstream gathers; cutting lineage here lets the
        # persisted ordering frame be released
        out = out.localCheckpoint(eager=True)
    finally:
        ordered.unpersist()
    return out
