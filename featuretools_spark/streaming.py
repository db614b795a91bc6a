"""Structured Streaming adapters.

The reference is batch-only (SURVEY §2.8); the engine's cutoff-time
merge is the batch analog of event-time processing with a perfect
watermark. For genuinely streaming inputs, these helpers express the
same temporal operators on a readStream source:

- streaming_session_stats: session_window(ts, gap) — the streaming
  twin of sessionize.py's lag+cumsum idiom
- streaming_rolling_agg: watermarked sliding-window aggregates — the
  streaming twin of the rolling_* primitives

Both are plain transformations over a streaming DataFrame; sink
choice (kafka/parquet/memory) is the caller's. Tested with a
memory sink + processAllAvailable() (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featuretools_spark.timedelta import Timedelta


def _gap_str(gap) -> str:
    td = Timedelta.parse(gap)
    return f"{int(td.to_seconds())} seconds"


def streaming_session_stats(
    events: DataFrame,
    entity_col: str,
    time_col: str,
    gap="30 minutes",
    value_col: str | None = None,
    watermark="1 hour",
) -> DataFrame:
    """Per-(entity, session) aggregates over a streaming source using
    native session windows."""
    events = events.withColumn(time_col, F.col(time_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return (
        events.withWatermark(time_col, _gap_str(watermark))
        .groupBy(
            F.session_window(F.col(time_col), _gap_str(gap)),
            F.col(entity_col),
        )
        .agg(*aggs)
    )


def streaming_rolling_agg(
    events: DataFrame,
    entity_col: str,
    time_col: str,
    value_col: str,
    window="10 minutes",
    slide="5 minutes",
    watermark="1 hour",
) -> DataFrame:
    """Watermarked sliding-window count/sum/mean per entity."""
    events = events.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return (
        events.withWatermark(time_col, _gap_str(watermark))
        .groupBy(
            F.window(F.col(time_col), _gap_str(window), _gap_str(slide)),
            F.col(entity_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.avg(value_col).alias("mean_v"),
        )
    )
