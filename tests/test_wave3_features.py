"""Wave-3 coverage: temporal cutoffs, FeatureOutputSlice, approximate
binning, ES parquet round-trip, get_valid_primitives."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.dfs import get_valid_primitives
from featuretools_spark.features import (
    AggregationFeature,
    FeatureOutputSlice,
    IdentityFeature,
)
from featuretools_spark.io import es_from_parquet, es_to_parquet
from featuretools_spark.primitives import get_aggregation_primitive
from featuretools_spark.time_utils import make_temporal_cutoffs

CUT = dt.datetime(2024, 1, 20)


def test_make_temporal_cutoffs(spark):
    cuts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10))], "uid long, time timestamp"
    )
    out = make_temporal_cutoffs(cuts, "uid", window_size="1 day",
                                num_windows=3)
    times = sorted(r["time"] for r in out.collect())
    assert times == [dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 9),
                     dt.datetime(2024, 1, 10)]
    out2 = make_temporal_cutoffs(cuts, "uid", num_windows=3,
                                 start=dt.datetime(2024, 1, 8))
    times2 = sorted(r["time"] for r in out2.collect())
    assert times2 == times


def test_feature_output_slice(es):
    et = IdentityFeature(es, "events", "event_type")
    prim = get_aggregation_primitive("n_most_common")
    prim.n = 2
    nmc = AggregationFeature(et, "users", prim, es=es)
    s0 = FeatureOutputSlice(nmc, 0)
    s1 = FeatureOutputSlice(nmc, 1)
    fm = fts.calculate_feature_matrix([s0, s1], es, cutoff_time=CUT)
    assert s0.get_name() in fm.columns and s1.get_name() in fm.columns
    row = fm.collect()[0]
    a, b = row[s0.get_name()], row[s1.get_name()]
    assert a is not None and b is not None and a != b


def test_approximate_binning(es, spark):
    """With approximate=2 days, all cutoffs inside one 2-day bin share
    the aggregate computed at the bin floor."""
    cuts = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 15, 6)), (0, dt.datetime(2024, 1, 15, 18)),
         (0, dt.datetime(2024, 1, 19))],
        "user_id long, time timestamp",
    )
    v = IdentityFeature(es, "events", "value")
    f = AggregationFeature(v, "users", "sum", es=es)
    exact = fts.calculate_feature_matrix([f], es, cutoff_time=cuts)
    approx = fts.calculate_feature_matrix([f], es, cutoff_time=cuts,
                                          approximate="2 days")
    ex = {r["time"]: r[f.get_name()] for r in exact.collect()}
    ap = {r["time"]: r[f.get_name()] for r in approx.collect()}
    t1, t2 = dt.datetime(2024, 1, 15, 6), dt.datetime(2024, 1, 15, 18)
    # same bin -> identical approximate values, exact values differ
    assert ap[t1] == ap[t2]
    assert ex[t1] != ex[t2]
    # approximate value = exact value at the bin floor (2-day bins
    # anchor to the epoch grid: floor(2024-01-15T06) = 2024-01-14T00)
    import calendar

    floor_s = (calendar.timegm(t1.timetuple()) // 172800) * 172800
    floor_ts = dt.datetime.utcfromtimestamp(floor_s)
    floor_exact = fts.calculate_feature_matrix(
        [f], es,
        cutoff_time=spark.createDataFrame(
            [(0, floor_ts)], "user_id long, time timestamp"
        ),
    ).collect()[0][f.get_name()]
    assert ap[t1] == floor_exact


def test_es_parquet_roundtrip(es, spark, tmp_path):
    d = str(tmp_path / "es_out")
    es.add_interesting_values(max_values=1, dataframe_name="events")
    es_to_parquet(es, d)
    es2 = es_from_parquet(spark, d)
    assert set(es2.tables) == set(es.tables)
    assert es2.index("events") == "event_id"
    assert es2.time_index("events") == "ts"
    assert len(es2.relationships) == len(es.relationships)
    assert es2.meta["events"].interesting_values
    assert es2["events"].count() == es["events"].count()


def test_get_valid_primitives(es):
    aggs, trans = get_valid_primitives(es, "users", max_depth=1)
    assert "sum" in aggs and "count" in aggs and "mode" in aggs
    assert "day" in trans or "year" in trans or len(trans) >= 0
