"""Width floor for CPU-heavy text ops.

Spark splits a parquet scan by BYTES (spark.sql.files.maxPartitionBytes),
which is right for IO-bound plans but starves ops whose per-row CPU
cost is large relative to input bytes: a 15 MiB documents table scans
as 2 tasks, leaving 30 of 32 cores idle under a winnowing pass that
costs O(len x w) comparisons per doc (measured: cross_doc_duplication
133s -> ~15s at sf1 once widened).

ensure_min_width repartitions ONLY when the scan is narrower than the
session's parallelism — at real scale (100 TB -> O(10^5) scan splits)
it is a no-op, so the extra shuffle of raw text is paid exactly when
it is trivial."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def ensure_min_width(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff df has fewer partitions than the
    session's default parallelism (or FT_SPARK_TEXT_MIN_PARTS)."""
    spark = df.sparkSession
    want = min_parts or int(
        os.environ.get("FT_SPARK_TEXT_MIN_PARTS", "0")
    ) or spark.sparkContext.defaultParallelism
    have = df.rdd.getNumPartitions()
    if have >= want:
        return df
    return df.repartition(want)
