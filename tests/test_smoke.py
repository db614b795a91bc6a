"""End-to-end smoke: scalar cutoff, per-row cutoffs, both strategies,
cross-checked against DuckDB SQL on the same parquet."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from featuretools_spark import (
    AggregationFeature,
    IdentityFeature,
    calculate_feature_matrix,
)

CUT = dt.datetime(2024, 1, 20)


def _collect_map(df, key, cols):
    rows = df.collect()
    return {r[key]: tuple(r[c] for c in cols) for r in rows}


def make_feats(es):
    val = IdentityFeature(es, "events", "value")
    eid = IdentityFeature(es, "events", "event_id")
    return [
        AggregationFeature(eid, "users", "count", es=es),
        AggregationFeature(val, "users", "sum", es=es),
        AggregationFeature(val, "users", "mean", es=es),
        AggregationFeature(val, "users", "std", es=es),
        AggregationFeature(val, "users", "min", es=es),
        AggregationFeature(val, "users", "max", es=es),
    ]


def oracle(duck, cut=CUT, extra=""):
    q = f"""
        SELECT u.user_id,
               count(e.event_id) AS cnt,
               coalesce(sum(e.value), 0) AS s,
               avg(e.value) AS m
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN events e
          ON e.user_id = u.user_id AND e.ts <= TIMESTAMP '{cut}' {extra}
        GROUP BY u.user_id
    """
    return {r[0]: (r[1], r[2], r[3]) for r in duck.execute(q).fetchall()}


def test_scalar_cutoff_join_strategy(es, duck):
    fm = calculate_feature_matrix(
        make_feats(es), es, cutoff_time=CUT
    )
    got = _collect_map(
        fm, "user_id", ["COUNT(events)", "SUM(events.value)", "MEAN(events.value)"]
    )
    want = oracle(duck)
    assert set(got) == set(want)
    for k, (c, s, m) in want.items():
        gc, gs, gm = got[k]
        assert gc == c, (k, gc, c)
        assert abs(gs - s) < 1e-6
        if m is None:
            assert gm is None
        else:
            assert abs(gm - m) < 1e-9


def test_per_row_cutoffs_both_strategies(es, duck, spark):
    cuts = (
        es["users"]
        .select("user_id")
        .crossJoin(
            spark.createDataFrame(
                [(dt.datetime(2024, 1, 10),), (dt.datetime(2024, 1, 25),)],
                "time timestamp",
            )
        )
    )
    fs = make_feats(es)
    fm_join = calculate_feature_matrix(fs, es, cutoff_time=cuts, strategy="join")
    fm_sm = calculate_feature_matrix(fs, es, cutoff_time=cuts, strategy="sortmerge")
    cols = [f.get_name() for f in fs]
    a = {(r["user_id"], r["time"]): tuple(r[c] for c in cols) for r in fm_join.collect()}
    b = {(r["user_id"], r["time"]): tuple(r[c] for c in cols) for r in fm_sm.collect()}
    assert set(a) == set(b)
    assert len(a) == cuts.count()
    for k in a:
        for x, y in zip(a[k], b[k]):
            if x is None or y is None:
                assert x == y, (k, a[k], b[k])
            else:
                assert abs(x - y) < 1e-6, (k, a[k], b[k])

    # oracle for one cutoff
    want = oracle(duck, cut=dt.datetime(2024, 1, 10))
    for (uid, t), vals in a.items():
        if t != dt.datetime(2024, 1, 10):
            continue
        c, s, m = want[uid]
        assert vals[0] == c
        assert abs(vals[1] - s) < 1e-6


def test_training_window(es, duck):
    fs = make_feats(es)[:2]
    fm = calculate_feature_matrix(
        fs, es, cutoff_time=CUT, training_window="5 days"
    )
    got = _collect_map(fm, "user_id", ["COUNT(events)", "SUM(events.value)"])
    want = oracle(
        duck,
        extra=f"AND e.ts > TIMESTAMP '{CUT - dt.timedelta(days=5)}'",
    )
    for k, (c, s, m) in want.items():
        assert got[k][0] == c, (k, got[k], (c, s))
        assert abs(got[k][1] - s) < 1e-6
