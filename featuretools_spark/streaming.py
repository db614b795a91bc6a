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


def streaming_running_features(
    events: DataFrame,
    entity_col: str,
    time_col: str,
    value_col: str,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-entity
    RUNNING feature vector maintained in state — the streaming twin of
    the batch as-of backfill (each emitted row holds the feature
    values as of that micro-batch, computed only from events at or
    before it: leakage-free by construction, matching the batch
    engine's cutoff semantics).

    State per entity: (n, sum, sum_sq, last_event_epoch) — constant
    size, merged associatively with each micro-batch's Arrow batch in
    vectorized pandas. Emits one row per (entity, batch) update:
    count / sum / mean / std (population, like the batch STD) /
    time_since_last at the batch's max event time.

    timeout_minutes: evict state for entities idle longer than this
    (processing-time timeout) — bounds state size on 10^12-entity
    streams where old entities never return.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    etype = dict(
        (f.name, f.dataType.simpleString()) for f in events.schema.fields
    )[entity_col]
    out_schema = (
        f"{entity_col} {etype}, n long, sum_v double, mean_v double, "
        "std_v double, time_since_last double, asof_epoch double"
    )
    state_schema = "n long, s double, ss double, last_t double"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        import numpy as np

        n0, s0, ss0, lt0 = state.get if state.exists else (0, 0.0, 0.0, None)
        prev_lt = lt0
        mx = None
        for pdf in pdfs:
            v = pd.to_numeric(pdf[value_col], errors="coerce")
            t = pd.to_datetime(pdf[time_col]).astype("int64") / 1e9
            n0 += int(v.notna().sum())
            s0 += float(np.nansum(v))
            ss0 += float(np.nansum(v * v))
            bmax = float(t.max())
            mx = bmax if mx is None else max(mx, bmax)
            lt0 = bmax if lt0 is None else max(lt0, bmax)
        if mx is None:
            return
        state.update((n0, s0, ss0, lt0))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        mean = s0 / n0 if n0 else None
        var = max(ss0 / n0 - mean * mean, 0.0) if n0 else None
        yield pd.DataFrame([{
            entity_col: key[0],
            "n": n0,
            "sum_v": s0,
            "mean_v": mean,
            "std_v": var ** 0.5 if var is not None else None,
            # time since the last event BEFORE this batch, as of the
            # batch's max event time (None on an entity's first batch)
            "time_since_last": (mx - prev_lt) if prev_lt is not None
            else None,
            "asof_epoch": mx,
        }])

    return (
        events.groupBy(entity_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", timeout
        )
    )


def streaming_dedup(
    events: DataFrame,
    content_cols: list[str],
    time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ops.dedup.exact_duplicates' keep-canonical
    filter: emit only the FIRST arrival of each exact content hash
    (same sha2-256 over the \\x1f-joined content columns as the batch
    op, so batch and stream agree on what "identical" means).

    `dropDuplicatesWithinWatermark` keeps one state row per distinct
    hash and lets Spark evict state older than the watermark — the
    standard bounded-state ingestion dedup. Duplicates arriving within
    the watermark window are suppressed exactly; a duplicate arriving
    LATER than the watermark horizon may be re-emitted (the documented
    at-least-once trade every bounded-state streaming dedup makes —
    run the batch exact_duplicates downstream for exactness)."""
    from pyspark.sql import functions as F

    h = F.sha2(
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in content_cols]
        ),
        256,
    )
    out = events.withColumn("content_hash", h)
    return out.withWatermark(time_col, watermark) \
        .dropDuplicatesWithinWatermark(["content_hash"])
