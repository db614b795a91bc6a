"""Custom user primitives (the UDF surface, reference
primitives/base/primitive_base.py:11-161 + custom-primitive tests at
tests/primitive_tests/test_agg_feats.py:530-635) and dynamic direct
features (parent aggregations pulled down to the child grain)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.features import (
    AggregationFeature,
    DirectFeature,
    IdentityFeature,
    TransformFeature,
)
from featuretools_spark.primitives.base import (
    AggregationPrimitive,
    TransformPrimitive,
)

CUT = dt.datetime(2024, 1, 20)


class SumOfSquares(AggregationPrimitive):
    """Custom aggregation: a user-defined Column-expression builder."""

    name = "sum_of_squares"
    default_value = 0

    def expr(self, inputs, ctx):
        x = inputs[0].cast("double")
        return F.sum(x * x)


class Clip100(TransformPrimitive):
    name = "clip_100"

    def expr(self, inputs, ctx):
        return F.least(F.greatest(inputs[0], F.lit(-100.0)), F.lit(100.0))


def test_custom_aggregation_primitive(es, duck):
    v = IdentityFeature(es, "events", "value")
    f = AggregationFeature(v, "users", SumOfSquares(), es=es)
    assert f.get_name() == "SUM_OF_SQUARES(events.value)"
    fm = fts.calculate_feature_matrix([f], es, cutoff_time=CUT)
    got = {r["user_id"]: r[f.get_name()] for r in fm.collect()}
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""SELECT u.user_id, coalesce(sum(e.value * e.value), 0)
                FROM (SELECT DISTINCT user_id FROM events) u
                LEFT JOIN events e ON e.user_id = u.user_id
                  AND e.ts <= TIMESTAMP '{CUT}'
                GROUP BY u.user_id"""
        ).fetchall()
    }
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_custom_transform_primitive(es):
    v = IdentityFeature(es, "events", "value")
    t = TransformFeature(Clip100(), [v])
    agg = AggregationFeature(t, "users", "max", es=es)
    fm = fts.calculate_feature_matrix([agg], es, cutoff_time=CUT)
    vals = [r[agg.get_name()] for r in fm.collect()]
    assert all(val is None or val <= 100.0 for val in vals)


def test_dynamic_direct_feature(es, duck):
    """DirectFeature of a parent AGGREGATION: each order row sees its
    customer's order count as of the same cutoff."""
    tpch = None
    # reuse conftest's tpch tables inside the shared es fixture? build here
    # from the events star instead: users <- events, events get
    # users.COUNT(events) pulled down
    eid = IdentityFeature(es, "events", "event_id")
    cnt = AggregationFeature(eid, "users", "count", es=es)
    d = DirectFeature(cnt, "events", es=es)
    assert d.get_name() == "users.COUNT(events)"
    cuts = es["events"].select(
        F.col("event_id"), F.lit(CUT).alias("time")
    ).limit(500)
    fm = fts.calculate_feature_matrix([d], es, cutoff_time=cuts)
    got = {r["event_id"]: r[d.get_name()] for r in fm.collect()}
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""WITH c AS (
                  SELECT user_id, count(*) AS n FROM events
                  WHERE ts <= TIMESTAMP '{CUT}' GROUP BY user_id
                )
                SELECT e.event_id, coalesce(c.n, 0)
                FROM events e LEFT JOIN c ON c.user_id = e.user_id
                ORDER BY e.event_id LIMIT 500"""
        ).fetchall()
    }
    assert len(got) == 500
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])
