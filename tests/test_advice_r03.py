"""Round-3 regression tests for the round-2 ADVICE findings:

1. COUNT with pruned inputs on the per-row-cutoff JOIN path must return
   0 (not 1) when the entity exists but no child row qualifies — the
   LEFT join's null-extended row must not be counted.
2. A WHERE-masked COUNT whose input is the (string) child index must
   survive strategy='sortmerge' (the kernel counts mask hits, never the
   casted value column).
3. The kernel's TREND must not zero out sub-hour windows: prefix sums
   are built on origin-shifted seconds and re-centered at each cutoff,
   so varx keeps window-span precision (raw epoch seconds lose it).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.datagen import make_entities, make_sequences
from featuretools_spark.features import (
    AggregationFeature,
    IdentityFeature,
    TransformFeature,
)
from featuretools_spark.primitives.transform import GreaterThanScalar
from featuretools_spark.timedelta import Timedelta


@pytest.fixture(scope="module")
def plain_es(spark):
    """sequences child, parent WITHOUT a time index (so no target-grain
    PIT mask can hide strategy disagreements)."""
    seqs = make_sequences(spark, n_rows=400, n_entities=8).cache()
    ents = make_entities(seqs).drop("first_seen")
    es = fts.EntitySet("advice")
    es.add_dataframe("entities", ents, index="entity_id")
    es.add_dataframe("sequences", seqs, index="doc_id",
                     time_index="event_time")
    es.add_relationship("entities", "entity_id", "sequences", "entity_id")
    return es, seqs, ents


def _per_row_cutoffs(spark, ents, base, step_ms=7):
    ids = [r["entity_id"] for r in ents.select("entity_id").collect()]
    return spark.createDataFrame(
        [(e, base + dt.timedelta(milliseconds=step_ms * i))
         for i, e in enumerate(ids)],
        "entity_id string, time timestamp",
    )


def test_count_zero_on_empty_window_all_strategies(spark, plain_es):
    es, seqs, ents = plain_es
    tmin = seqs.agg(F.min("event_time")).collect()[0][0]
    # distinct per-row cutoffs 1s after the earliest event with a 1ms
    # training window: every window is empty, every entity pre-exists
    cuts = _per_row_cutoffs(spark, ents, tmin + dt.timedelta(seconds=1))
    did = IdentityFeature(es, "sequences", "doc_id")
    ntok = IdentityFeature(es, "sequences", "n_tok")
    feats = [
        AggregationFeature(did, "entities", "count", es=es),
        AggregationFeature(ntok, "entities", "sum", es=es),
    ]
    for strat in ("join", "sortmerge"):
        fm = fts.calculate_feature_matrix(
            feats, es, cutoff_time=cuts,
            training_window=Timedelta(0.001, "s"), strategy=strat,
        )
        ccol = [c for c in fm.columns if "COUNT" in c.upper()][0]
        vals = [r[ccol] for r in fm.collect()]
        assert vals and all(v == 0 for v in vals), (strat, vals)


def test_masked_count_string_index_sortmerge(spark, plain_es):
    es, seqs, ents = plain_es
    tmax = seqs.agg(F.max("event_time")).collect()[0][0]
    cuts = _per_row_cutoffs(spark, ents, tmax + dt.timedelta(seconds=1))
    did = IdentityFeature(es, "sequences", "doc_id")
    ntok = IdentityFeature(es, "sequences", "n_tok")
    wh = TransformFeature(GreaterThanScalar(value=30), [ntok])
    cntw = AggregationFeature(did, "entities", "count", es=es, where=wh)
    res = {}
    for strat in ("join", "sortmerge"):
        fm = fts.calculate_feature_matrix([cntw], es, cutoff_time=cuts,
                                          strategy=strat)
        ccol = [c for c in fm.columns if "COUNT" in c.upper()][0]
        res[strat] = sorted((r["entity_id"], float(r[ccol]))
                            for r in fm.collect())
    assert res["join"] == res["sortmerge"]
    assert any(v > 0 for _, v in res["join"])  # mask actually selects rows


@pytest.mark.parametrize("salt", [None, 4])
def test_trend_subhour_window_kernel(spark, salt):
    # 10 events 37s apart (~6 min span), exact slope 2.0/s; the first
    # timestamp is NOT minute-aligned so the reference unit dividend = 1
    t0 = dt.datetime(2024, 5, 1, 13, 7, 11)
    rows = [
        (f"d{i}", "e1", t0 + dt.timedelta(seconds=37 * i),
         2.0 * 37 * i + 5.0)
        for i in range(10)
    ]
    child = spark.createDataFrame(
        rows, "doc_id string, entity_id string, event_time timestamp, "
              "val double")
    ents = spark.createDataFrame([("e1",)], "entity_id string")
    es = fts.EntitySet("trend")
    es.add_dataframe("entities", ents, index="entity_id")
    es.add_dataframe("sequences", child, index="doc_id",
                     time_index="event_time")
    es.add_relationship("entities", "entity_id", "sequences", "entity_id")
    tr = AggregationFeature(
        IdentityFeature(es, "sequences", "val"), "entities", "trend", es=es)
    cuts = spark.createDataFrame(
        [("e1", t0 + dt.timedelta(hours=1)),
         ("e1", t0 + dt.timedelta(hours=2))],
        "entity_id string, time timestamp")
    fm = fts.calculate_feature_matrix([tr], es, cutoff_time=cuts,
                                      strategy="sortmerge", salt=salt)
    tcol = [c for c in fm.columns if "TREND" in c.upper()][0]
    vals = [r[tcol] for r in fm.collect()]
    assert len(vals) == 2
    for v in vals:
        assert v == pytest.approx(2.0, rel=1e-9), (salt, vals)


def test_holistic_over_stacked_per_row_cutoffs(spark, es):
    """VERDICT r2 #6: holistic (twostage) primitives over a stacked
    depth-2 input at PER-ROW cutoffs — previously NotImplementedError,
    now served from the shared cutoff-join frame (which carries the
    __aux_* inner matrix). Ground truth: the scalar path per distinct
    cutoff."""
    from featuretools_spark.features import AggregationFeature, IdentityFeature

    qty = IdentityFeature(es, "lineitem", "l_quantity")
    inner = AggregationFeature(qty, "orders", "sum", es=es)
    feats = [
        AggregationFeature(inner, "customer", "mode", es=es),        # counts
        AggregationFeature(inner, "customer", "entropy", es=es),     # counts
        AggregationFeature(inner, "customer", "count_above_mean",
                           es=es),                                   # flag
        AggregationFeature(inner, "customer",
                           "max_consecutive_positives", es=es),      # complex
    ]
    cols = [f.get_name() for f in feats]
    t1, t2 = dt.datetime(1995, 1, 1), dt.datetime(1997, 1, 1)
    custs = [r[0] for r in
             es["customer"].select("c_custkey").limit(30).collect()]
    cuts = spark.createDataFrame(
        [(c, t1 if i % 2 == 0 else t2) for i, c in enumerate(custs)],
        "c_custkey long, time timestamp",
    )
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    got = {(r["c_custkey"], r["time"]): tuple(r[c] for c in cols)
           for r in fm.collect()}
    assert len(got) == len(custs)
    for t in (t1, t2):
        ids = [c for i, c in enumerate(custs) if (i % 2 == 0) == (t == t1)]
        ref = fts.calculate_feature_matrix(
            feats, es, cutoff_time=t, instance_ids=ids)
        for r in ref.collect():
            want = tuple(r[c] for c in cols)
            have = got[(r["c_custkey"], t)]
            for x, y in zip(want, have):
                if x is None or y is None:
                    assert x == y, (r["c_custkey"], t, want, have)
                else:
                    assert abs(float(x) - float(y)) < 1e-9, (
                        r["c_custkey"], t, want, have)


def test_strategy_auto_routes_to_pure_jvm_join(spark, es):
    """Round-5 router policy as code: strategy="auto" must produce
    the join path's pure-JVM plan (no Python stages) for plain
    aggregations — the measured density sweeps found no throughput
    regime where the kernel wins, so auto == join. Unknown strategy
    names raise."""
    import datetime as dt

    import pytest

    import featuretools_spark as fts
    from featuretools_spark.features import (
        AggregationFeature, IdentityFeature,
    )

    val = IdentityFeature(es, "events", "value")
    agg = AggregationFeature(val, "users", "sum", es=es)
    fm = fts.calculate_feature_matrix(
        [agg], es, cutoff_time=dt.datetime(2024, 3, 1), strategy="auto")
    plan = fm._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert fm.count() > 0

    with pytest.raises(ValueError, match="unknown strategy"):
        fts.calculate_feature_matrix(
            [agg], es, cutoff_time=dt.datetime(2024, 3, 1),
            strategy="hash")
