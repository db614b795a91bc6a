"""North-rule tests on the BASELINE.json target table shape:
zero temporal leakage, token-array pass-through equality,
partitioning invariance, include_cutoff_time semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.datagen import make_cutoffs, make_entities, make_sequences
from featuretools_spark.features import AggregationFeature, IdentityFeature


@pytest.fixture(scope="module")
def seq_es(spark):
    seqs = make_sequences(spark, n_rows=2000, n_entities=50).cache()
    ents = make_entities(seqs)
    es = fts.EntitySet("seq")
    es.add_dataframe("entities", ents, index="entity_id",
                     time_index="first_seen")
    es.add_dataframe("sequences", seqs, index="doc_id",
                     time_index="event_time")
    es.add_relationship("entities", "entity_id", "sequences", "entity_id")
    return es, seqs


def _feats(es):
    n_tok = IdentityFeature(es, "sequences", "n_tok")
    did = IdentityFeature(es, "sequences", "doc_id")
    return [
        AggregationFeature(did, "entities", "count", es=es),
        AggregationFeature(n_tok, "entities", "sum", es=es),
        AggregationFeature(n_tok, "entities", "mean", es=es),
        AggregationFeature(
            IdentityFeature(es, "sequences", "event_time"),
            "entities", "time_since_last", es=es,
        ),
    ]


def _fm_dict(fm, cols):
    return {
        (r["entity_id"], r["time"]): tuple(r[c] for c in cols)
        for r in fm.collect()
    }


def test_zero_leakage_future_perturbation(spark, seq_es):
    """Perturbing every row AFTER its entity's cutoff must not change
    the feature matrix."""
    es, seqs = seq_es
    cuts = make_cutoffs(spark, seqs, per_entity=2)
    feats = _feats(es)
    cols = [f.get_name() for f in feats]
    fm1 = _fm_dict(fts.calculate_feature_matrix(feats, es, cutoff_time=cuts), cols)

    # perturb: multiply n_tok by 1000 for rows strictly after the max cutoff
    max_cut = cuts.agg(F.min("time")).collect()[0][0]
    seqs2 = seqs.withColumn(
        "n_tok",
        F.when(F.col("event_time") > F.lit(max_cut), F.col("n_tok") * 1000)
        .otherwise(F.col("n_tok")),
    )
    es2 = fts.EntitySet("seq2")
    es2.add_dataframe("entities", make_entities(seqs), index="entity_id",
                      time_index="first_seen")
    es2.add_dataframe("sequences", seqs2, index="doc_id",
                      time_index="event_time")
    es2.add_relationship("entities", "entity_id", "sequences", "entity_id")
    cuts_early = cuts.filter(F.col("time") <= F.lit(max_cut))
    feats2 = _feats(es2)
    fm2 = _fm_dict(
        fts.calculate_feature_matrix(feats2, es2, cutoff_time=cuts_early), cols
    )
    fm1_early = {k: v for k, v in fm1.items() if k[1] <= max_cut}
    assert fm1_early == fm2


def test_partitioning_invariance(spark, seq_es):
    """Same matrix regardless of input partitioning (shuffle-invariance:
    integer sums + exact aggs are order-independent)."""
    es, seqs = seq_es
    cuts = make_cutoffs(spark, seqs, per_entity=2)
    feats = _feats(es)
    cols = [f.get_name() for f in feats]
    fm1 = _fm_dict(fts.calculate_feature_matrix(feats, es, cutoff_time=cuts), cols)

    es2 = fts.EntitySet("seq3")
    es2.add_dataframe("entities", make_entities(seqs), index="entity_id",
                      time_index="first_seen")
    es2.add_dataframe("sequences", seqs.repartition(17), index="doc_id",
                      time_index="event_time")
    es2.add_relationship("entities", "entity_id", "sequences", "entity_id")
    fm2 = _fm_dict(
        fts.calculate_feature_matrix(_feats(es2), es2, cutoff_time=cuts), cols
    )
    assert fm1 == fm2


def test_include_cutoff_time_semantics(spark, seq_es):
    """A cutoff placed exactly at an event time includes that event iff
    include_cutoff_time=True (reference _handle_time semantics)."""
    es, seqs = seq_es
    one = seqs.orderBy("doc_id").limit(1).collect()[0]
    cuts = spark.createDataFrame(
        [(one["entity_id"], one["event_time"])], "entity_id string, time timestamp"
    )
    feats = _feats(es)[:1]  # COUNT(sequences)
    inc = fts.calculate_feature_matrix(
        feats, es, cutoff_time=cuts, include_cutoff_time=True
    ).collect()[0]["COUNT(sequences)"]
    exc = fts.calculate_feature_matrix(
        feats, es, cutoff_time=cuts, include_cutoff_time=False
    ).collect()[0]["COUNT(sequences)"]
    assert inc == exc + 1


def test_token_passthrough_equality(spark, seq_es):
    """tokens array<int32> must survive the pipeline byte-identically:
    join features back onto sequence rows and compare token arrays +
    dtypes with the originals."""
    es, seqs = seq_es
    cuts = make_cutoffs(spark, seqs, per_entity=2)
    feats = _feats(es)[:2]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    enriched = seqs.join(
        fm.select("entity_id", "time", F.col("COUNT(sequences)").alias("cnt")),
        on=(seqs["entity_id"] == fm["entity_id"]),
        how="left",
    )
    # schema: tokens stays array<int>
    field = dict(zip(enriched.schema.names, enriched.schema.fields))["tokens"]
    assert field.dataType.simpleString() == "array<int>"
    orig = {r["doc_id"]: r["tokens"] for r in seqs.collect()}
    got = {}
    for r in enriched.select(seqs["doc_id"], "tokens").distinct().collect():
        got[r["doc_id"]] = r["tokens"]
    assert orig == got


def test_nullable_agg_output_types(spark, seq_es):
    """Reference promotes pandas dtypes to nullable (Int64/boolean)
    when NULLs appear in agg outputs (calculate_feature_matrix.py:
    906-931). The Spark-native equivalent: every agg output column is
    a NULLABLE Spark type and integer aggregates KEEP their integral
    type when a group is empty (NULL, never NaN-upcast-to-double)."""
    es, seqs = seq_es
    # a cutoff before everything -> every group empty at that cutoff
    cuts = spark.createDataFrame(
        [("e00001", dt.datetime(2000, 1, 1)),
         ("e00001", dt.datetime(2030, 1, 1))],
        "entity_id string, time timestamp",
    )
    n_tok = IdentityFeature(es, "sequences", "n_tok")
    feats = [
        AggregationFeature(n_tok, "entities", "sum", es=es),
        AggregationFeature(n_tok, "entities", "max", es=es),
        AggregationFeature(
            IdentityFeature(es, "sequences", "doc_id"), "entities",
            "count", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    types = {f.name: (f.dataType.simpleString(), f.nullable)
             for f in fm.schema.fields}
    assert types["SUM(sequences.n_tok)"][0] == "bigint"
    assert types["MAX(sequences.n_tok)"][0] == "int"
    assert types["COUNT(sequences)"][0] == "bigint"
    # aggregates without a default fill stay NULLABLE (the analog of
    # the reference's Int64 promotion); defaulted ones (sum/count ->
    # 0) may be non-null — that IS the default semantics
    assert types["MAX(sequences.n_tok)"][1]
    rows = {r["time"].year: r for r in fm.collect()}
    assert rows[2000]["MAX(sequences.n_tok)"] is None  # NULL, not NaN
    assert rows[2000]["COUNT(sequences)"] == 0         # count default
    assert rows[2000]["SUM(sequences.n_tok)"] == 0     # sum default
    assert rows[2030]["MAX(sequences.n_tok)"] is not None


def _assert_close(a, b):
    assert set(a) == set(b)
    bad = []
    for k in a:
        for x, y in zip(a[k], b[k]):
            if x is None or y is None:
                if x != y:
                    bad.append((k, a[k], b[k]))
            elif abs(float(x) - float(y)) > 1e-6:
                bad.append((k, a[k], b[k]))
    assert not bad, bad[:5]


@pytest.mark.parametrize("include_cutoff", [True, False])
@pytest.mark.parametrize("window", [None, "3 days"])
def test_sortmerge_matches_join_windows(spark, seq_es, include_cutoff, window):
    """Kernel parity across the 4 window-boundary modes: the lo/hi
    marker tiebreaks must reproduce _time_predicate exactly."""
    es, seqs = seq_es
    cuts = make_cutoffs(spark, seqs, per_entity=3)
    n_tok = IdentityFeature(es, "sequences", "n_tok")
    did = IdentityFeature(es, "sequences", "doc_id")
    src = IdentityFeature(es, "sequences", "source")
    feats = [
        AggregationFeature(did, "entities", "count", es=es),
        AggregationFeature(n_tok, "entities", "sum", es=es),
        AggregationFeature(n_tok, "entities", "std", es=es),
        AggregationFeature(n_tok, "entities", "min", es=es),
        AggregationFeature(n_tok, "entities", "max", es=es),
        AggregationFeature(n_tok, "entities", "trend", es=es),
        # routed to the join strategy inside strategy='sortmerge'
        AggregationFeature(n_tok, "entities", "median", es=es),
        AggregationFeature(src, "entities", "num_unique", es=es),
        # where-clause through the kernel mask path
        AggregationFeature(n_tok, "entities", "sum", es=es,
                           where=(src == "web")).rename("sum_web"),
    ]
    cols = [f.get_name() for f in feats]
    kw = dict(cutoff_time=cuts, include_cutoff_time=include_cutoff,
              training_window=window)
    a = _fm_dict(fts.calculate_feature_matrix(feats, es, strategy="join",
                                              **kw), cols)
    b = _fm_dict(fts.calculate_feature_matrix(feats, es, strategy="sortmerge",
                                              **kw), cols)
    _assert_close(a, b)


@pytest.mark.parametrize("window", [None, "3 days"])
def test_salted_sortmerge_matches_join(spark, seq_es, window):
    """Explicit hot-key salting: events split into salt sub-streams,
    markers replicate, kernel emits partials, one JVM groupBy merges —
    results must equal the join strategy for every kernel primitive."""
    es, seqs = seq_es
    cuts = make_cutoffs(spark, seqs, per_entity=3)
    n_tok = IdentityFeature(es, "sequences", "n_tok")
    did = IdentityFeature(es, "sequences", "doc_id")
    ts = IdentityFeature(es, "sequences", "event_time")
    feats = [
        AggregationFeature(did, "entities", "count", es=es),
        AggregationFeature(n_tok, "entities", "sum", es=es),
        AggregationFeature(n_tok, "entities", "mean", es=es),
        AggregationFeature(n_tok, "entities", "std", es=es),
        AggregationFeature(n_tok, "entities", "min", es=es),
        AggregationFeature(n_tok, "entities", "max", es=es),
        AggregationFeature(n_tok, "entities", "first", es=es),
        AggregationFeature(n_tok, "entities", "last", es=es),
        AggregationFeature(n_tok, "entities", "trend", es=es),
        AggregationFeature(n_tok, "entities", "variance", es=es),
        AggregationFeature(ts, "entities", "time_since_last", es=es),
        AggregationFeature(ts, "entities", "time_since_first", es=es),
        AggregationFeature(ts, "entities", "first_last_time_delta", es=es),
        AggregationFeature(ts, "entities", "avg_time_between", es=es),
    ]
    # boolean reducers (round-3 kernel additions)
    from featuretools_spark.features import TransformFeature
    from featuretools_spark.primitives.transform import GreaterThanScalar

    big = TransformFeature(GreaterThanScalar(value=256), [n_tok])
    feats += [
        AggregationFeature(big, "entities", "num_true", es=es),
        AggregationFeature(big, "entities", "percent_true", es=es),
        AggregationFeature(big, "entities", "any", es=es),
        AggregationFeature(big, "entities", "all", es=es),
    ]
    cols = [f.get_name() for f in feats]
    kw = dict(cutoff_time=cuts, training_window=window)
    a = _fm_dict(fts.calculate_feature_matrix(
        feats, es, strategy="join", **kw), cols)
    b = _fm_dict(fts.calculate_feature_matrix(
        feats, es, strategy="sortmerge", salt=4, **kw), cols)
    _assert_close(a, b)


def test_sortmerge_matches_join_n_observations(spark, seq_es):
    """use_previous='N observations' in the kernel is the clamp
    lo = max(lo, hi - n): must equal the join strategy's row_number."""
    es, seqs = seq_es
    cuts = make_cutoffs(spark, seqs, per_entity=3)
    n_tok = IdentityFeature(es, "sequences", "n_tok")
    feats = [
        AggregationFeature(n_tok, "entities", "sum", es=es,
                           use_previous="5 observations"),
        AggregationFeature(n_tok, "entities", "mean", es=es,
                           use_previous="5 observations"),
        AggregationFeature(n_tok, "entities", "median", es=es,
                           use_previous="5 observations"),
    ]
    cols = [f.get_name() for f in feats]
    a = _fm_dict(fts.calculate_feature_matrix(feats, es, cutoff_time=cuts,
                                              strategy="join"), cols)
    b = _fm_dict(fts.calculate_feature_matrix(feats, es, cutoff_time=cuts,
                                              strategy="sortmerge"), cols)
    _assert_close(a, b)


def test_sortmerge_matches_join_on_sequences(spark, seq_es):
    es, seqs = seq_es
    cuts = make_cutoffs(spark, seqs, per_entity=3)
    feats = _feats(es)
    cols = [f.get_name() for f in feats]
    a = _fm_dict(
        fts.calculate_feature_matrix(feats, es, cutoff_time=cuts,
                                     strategy="join"), cols)
    b = _fm_dict(
        fts.calculate_feature_matrix(feats, es, cutoff_time=cuts,
                                     strategy="sortmerge"), cols)
    assert set(a) == set(b)
    bad = []
    for k in a:
        for x, y in zip(a[k], b[k]):
            if x is None or y is None:
                if x != y:
                    bad.append((k, a[k], b[k]))
            elif abs(float(x) - float(y)) > 1e-6:
                bad.append((k, a[k], b[k]))
    assert not bad, bad[:5]
