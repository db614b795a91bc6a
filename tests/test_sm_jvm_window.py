"""Round-8 JVM running-window fast path for strategy='sortmerge'
(asof._running_window_result): unbounded windows with no last-N clamp
evaluate as pure-JVM window aggregates at the marker rows instead of
the Arrow mapInArrow sweep.

Pinned here: (1) value parity with the Arrow kernel over every
supported primitive, unsalted and salted; (2) the fast path's plan has
NO Python evaluation node; (3) ineligible calls (training_window,
n_observations, trend) still route to the Arrow kernel and agree with
the join strategy (covered in test_sequences_northrule, re-asserted
cheaply here via plan shape).
"""

import math
import os

import pytest
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.datagen import make_cutoffs, make_entities, make_sequences
from featuretools_spark.features import AggregationFeature, IdentityFeature

PRIMS_NTOK = [
    "count", "sum", "mean", "std", "variance", "min", "max",
    "first", "last", "num_true", "any", "all", "percent_true",
]
PRIMS_TIME = [
    "time_since_last", "time_since_first", "avg_time_between",
    "first_last_time_delta",
]


@pytest.fixture(scope="module")
def es_cuts(spark):
    seqs = make_sequences(spark, n_rows=3000, n_entities=40,
                          hot_row_frac=0.3, n_hot=1).withColumn(
        "is_big", F.col("n_tok") > 256
    ).cache()
    ents = make_entities(seqs)
    es = fts.EntitySet("smjvm")
    es.add_dataframe("entities", ents, index="entity_id",
                     time_index="first_seen")
    es.add_dataframe("sequences", seqs, index="doc_id",
                     time_index="event_time")
    es.add_relationship("entities", "entity_id", "sequences", "entity_id")
    cuts = make_cutoffs(spark, seqs, per_entity=3)
    return es, cuts


def _feats(es):
    n_tok = IdentityFeature(es, "sequences", "n_tok")
    big = IdentityFeature(es, "sequences", "is_big")
    ts = IdentityFeature(es, "sequences", "event_time")
    feats = []
    for p in PRIMS_NTOK:
        col = big if p in ("any", "all", "num_true", "percent_true") else n_tok
        feats.append(AggregationFeature(col, "entities", p, es=es))
    for p in PRIMS_TIME:
        feats.append(AggregationFeature(ts, "entities", p, es=es))
    # a masked count exercises the where-column path
    feats.append(AggregationFeature(
        IdentityFeature(es, "sequences", "doc_id"), "entities", "count",
        where=big, es=es))
    return feats


def _collect(fm, cols):
    return {
        (r["entity_id"], r["time"]): tuple(r[c] for c in cols)
        for r in fm.collect()
    }


def _assert_close(a, b):
    assert a.keys() == b.keys()
    for k in a:
        for x, y in zip(a[k], b[k]):
            if x is None or y is None:
                assert x == y, (k, x, y)
            elif isinstance(x, float):
                assert x == pytest.approx(y, rel=1e-9, abs=1e-9) or (
                    math.isnan(x) and math.isnan(y)), (k, x, y)
            else:
                assert x == y, (k, x, y)


@pytest.mark.parametrize("salt", [None, 4])
def test_jvm_matches_arrow_kernel(spark, es_cuts, salt):
    es, cuts = es_cuts
    feats = _feats(es)
    cols = [f.get_name() for f in feats]
    try:
        os.environ["FT_SPARK_SM_JVM"] = "1"
        jvm = _collect(fts.calculate_feature_matrix(
            feats, es, cutoff_time=cuts, strategy="sortmerge", salt=salt),
            cols)
        os.environ["FT_SPARK_SM_JVM"] = "0"
        arrow = _collect(fts.calculate_feature_matrix(
            feats, es, cutoff_time=cuts, strategy="sortmerge", salt=salt),
            cols)
    finally:
        os.environ.pop("FT_SPARK_SM_JVM", None)
    _assert_close(jvm, arrow)


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_fast_path_has_no_python_node(spark, es_cuts):
    es, cuts = es_cuts
    feats = _feats(es)
    plan = _plan(fts.calculate_feature_matrix(
        feats, es, cutoff_time=cuts, strategy="sortmerge"))
    for node in ("MapInArrow", "ArrowEvalPython", "BatchEvalPython",
                 "FlatMapGroupsInPandas"):
        assert node not in plan, node
    assert "Window" in plan


def test_ineligible_calls_keep_arrow_kernel(spark, es_cuts):
    es, cuts = es_cuts
    feats = _feats(es)[:3]
    # training_window -> lo-markers -> Arrow kernel
    plan = _plan(fts.calculate_feature_matrix(
        feats, es, cutoff_time=cuts, strategy="sortmerge",
        training_window="30 days"))
    assert "MapInArrow" in plan
    # trend -> Arrow kernel
    n_tok = IdentityFeature(es, "sequences", "n_tok")
    plan2 = _plan(fts.calculate_feature_matrix(
        [AggregationFeature(n_tok, "entities", "trend", es=es)],
        es, cutoff_time=cuts, strategy="sortmerge"))
    assert "MapInArrow" in plan2
