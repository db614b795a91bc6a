"""Sessionize by inactivity gap — the north rule's session operator.

NOT in the reference (featuretools models sessions as a pre-existing
table, demo/mock_customer.py:45-68); implemented with the standard
Spark idiom: flag rows whose gap from the previous event exceeds the
threshold, then a running sum of flags over
Window.partitionBy(entity).orderBy(time) assigns session ids. One
shuffle (by entity key), whole-stage codegen, no UDFs. The streaming
analog is F.session_window(ts, gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from featuretools_spark.timedelta import Timedelta


def sessionize(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    gap="30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign per-entity session ids: a new session starts when the
    time since the previous event exceeds `gap`."""
    gap_s = Timedelta.parse(gap).to_seconds()
    w = W.partitionBy(entity_col).orderBy(F.col(time_col).asc())
    prev = F.lag(F.col(time_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.col(time_col).cast("timestamp").cast("double") - prev.cast("timestamp").cast("double")) > gap_s),
        1,
    ).otherwise(0)
    run = W.partitionBy(entity_col).orderBy(F.col(time_col).asc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    gap="30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per (entity, session):
    start/end/duration/event count (+ sum of value_col if given)."""
    s = sessionize(df, entity_col, time_col, gap)
    aggs = [
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        (F.max(time_col).cast("timestamp").cast("double") - F.min(time_col).cast("timestamp").cast("double")).alias(
            "duration_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return s.groupBy(entity_col, "session_id").agg(*aggs)
