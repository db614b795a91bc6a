"""EntitySet ops: interesting values + DFS where clauses, secondary
time index masking, encode_features, selection ops, normalize, concat,
query_by_values."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.encode import (
    encode_features,
    remove_highly_correlated_features,
    remove_highly_null_features,
    remove_low_information_features,
    remove_single_value_features,
)
from featuretools_spark.features import AggregationFeature, IdentityFeature

CUT = dt.datetime(2024, 1, 20)


def test_interesting_values_where_dfs(es, duck):
    es.add_interesting_values(max_values=2, dataframe_name="events")
    iv = es.meta["events"].interesting_values
    assert "event_type" in iv and len(iv["event_type"]) == 2
    feats = fts.dfs(
        entityset=es, target_dataframe_name="users", features_only=True,
        agg_primitives=["count"], trans_primitives=[], max_depth=1,
        where_primitives=["count"],
    )
    names = [f.get_name() for f in feats]
    v0 = iv["event_type"][0]
    assert f"COUNT(events WHERE event_type = {v0})" in names
    # execute one where feature and check against duckdb
    wf = [f for f in feats if "WHERE event_type" in f.get_name()][:1]
    fm = fts.calculate_feature_matrix(wf, es, cutoff_time=CUT)
    got = {r["user_id"]: r[wf[0].get_name()] for r in fm.collect()}
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""SELECT u.user_id, count(CASE WHEN e.event_type = '{v0}'
                THEN 1 END)
                FROM (SELECT DISTINCT user_id FROM events) u
                LEFT JOIN events e ON e.user_id = u.user_id
                  AND e.ts <= TIMESTAMP '{CUT}'
                GROUP BY u.user_id"""
        ).fetchall()
    }
    assert got == want


def test_secondary_time_index_masking(spark):
    """Values governed by a secondary time index are invisible before
    that time: SUM over a masked column ignores rows whose sec time is
    at/after the cutoff."""
    rows = [
        (1, 10, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 5), 100.0),
        (2, 10, dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 20), 200.0),
        (3, 10, dt.datetime(2024, 1, 3), None, 300.0),
    ]
    child = spark.createDataFrame(
        rows, "id long, uid long, ts timestamp, resolved_at timestamp, cost double"
    )
    parent = child.select("uid").distinct()
    es = fts.EntitySet("sec")
    es.add_dataframe("parents", parent, index="uid")
    es.add_dataframe(
        "child", child, index="id", time_index="ts",
        secondary_time_index={"resolved_at": ["cost"]},
    )
    es.add_relationship("parents", "uid", "child", "uid")
    f = AggregationFeature(
        IdentityFeature(es, "child", "cost"), "parents", "sum", es=es
    )
    fm = fts.calculate_feature_matrix([f], es, cutoff_time=dt.datetime(2024, 1, 10))
    val = fm.collect()[0][f.get_name()]
    # row1 resolved 1/5 (< cutoff) -> visible; row2 resolved 1/20 -> masked;
    # row3 never resolved -> masked
    assert val == 100.0
    # per-row cutoff path agrees
    cuts = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 10))], "uid long, time timestamp"
    )
    fm2 = fts.calculate_feature_matrix([f], es, cutoff_time=cuts)
    assert fm2.collect()[0][f.get_name()] == 100.0


def test_encode_and_selection(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0, None, 5.0), (2, "b", 2.0, None, 10.0),
         (3, "a", 3.0, None, 15.0), (4, "c", 4.0, None, 20.0)],
        "id long, cat string, x double, all_null double, y double",
    )
    enc = encode_features(df, ["cat"], top_n=2)
    cols = set(enc.columns)
    assert "cat = a" in cols and "cat = b" in cols and "cat is unknown" in cols
    row = {r["id"]: r for r in enc.collect()}
    assert row[1]["cat = a"] == 1 and row[4]["cat is unknown"] == 1

    # selection ops
    assert "all_null" not in remove_highly_null_features(df, 0.9).columns
    df2 = df.withColumn("const", F.lit(7))
    assert "const" not in remove_single_value_features(df2, count_nan_as_value=True).columns
    low = remove_low_information_features(df2, keys=["id"])
    assert "const" not in low.columns and "all_null" not in low.columns
    # y = 5x exactly correlated -> y (later column) dropped
    corr = remove_highly_correlated_features(df, keys=["id"])
    assert "y" not in corr.columns and "x" in corr.columns


def test_normalize_and_concat_and_query(spark):
    base = spark.createDataFrame(
        [(1, "s1", "web", dt.datetime(2024, 1, 1)),
         (2, "s1", "web", dt.datetime(2024, 1, 2)),
         (3, "s2", "app", dt.datetime(2024, 1, 3))],
        "id long, sess string, channel string, ts timestamp",
    )
    es = fts.EntitySet("n")
    es.add_dataframe("log", base, index="id", time_index="ts")
    es.normalize_dataframe("log", "sessions", index="sess",
                           additional_columns=["channel"])
    assert "sessions" in es
    sess = {r["sess"]: r["channel"] for r in es["sessions"].collect()}
    assert sess == {"s1": "web", "s2": "app"}
    assert "channel" not in es["log"].columns
    assert any(r.parent_name == "sessions" for r in es.relationships)

    q = es.query_by_values("log", [1, 3])
    assert {r["id"] for r in q.collect()} == {1, 3}
    q2 = es.query_by_values("log", ["s1"], column_name="sess",
                            time_last=dt.datetime(2024, 1, 1))
    assert {r["id"] for r in q2.collect()} == {1}
