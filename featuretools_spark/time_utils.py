"""Temporal cutoff utilities.

make_temporal_cutoffs mirrors the reference (utils/time_utils.py:7-57):
fan each (instance, label-time) pair into a series of earlier cutoff
windows — pure Spark (explode over F.sequence), no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featuretools_spark.timedelta import Timedelta


def make_temporal_cutoffs(
    cutoffs: DataFrame,
    instance_col: str,
    time_col: str = "time",
    window_size=None,
    num_windows: int = None,
    start=None,
) -> DataFrame:
    """Expand each cutoff row into num_windows rows stepping back
    window_size each: times are
    [t - (num_windows-1)*w, ..., t - w, t] (ascending).

    Exactly two of (window_size, num_windows, start) must be given;
    the third is derived (reference semantics).
    """
    given = sum(x is not None for x in (window_size, num_windows, start))
    if given < 2:
        raise ValueError("need two of window_size / num_windows / start")
    t = F.col(time_col).cast("timestamp")
    if window_size is not None:
        w = Timedelta.parse(window_size)
        step = F.expr(
            f"INTERVAL {int(round(w.to_seconds() * 1e6))} MICROSECOND"
        )
        if num_windows is not None:
            first = t - step * (num_windows - 1)
        else:
            first = F.lit(start).cast("timestamp")
        seq = F.sequence(first, t, step)
    else:  # num_windows + start → derive the step
        first = F.lit(start).cast("timestamp")
        total_us = F.unix_micros(t) - F.unix_micros(first)
        step_us = (total_us / F.lit(max(num_windows - 1, 1))).cast("long")
        idx = F.sequence(F.lit(0), F.lit(num_windows - 1))
        seq = F.transform(
            idx, lambda i: F.timestamp_micros(
                F.unix_micros(first) + i * step_us
            )
        )
    return cutoffs.select(
        F.col(instance_col),
        F.explode(seq).alias(time_col),
    )
