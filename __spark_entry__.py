"""Driver contract for the spark-graft builder (PySpark target).

Every query below runs through the featuretools_spark engine
(EntitySet → features → calculate_feature_matrix / sessionize), and
each has an equivalent ANSI-SQL oracle for DuckDB.

Conventions for exact oracle matching (bit-identical doubles before
rounding — the driver hashes values):
- money/value columns are quantized to integer cents
  (floor(x*100 + 0.5)) BEFORE aggregation on BOTH sides: integer sums
  are exact and order-independent, so sum/mean are bit-identical
  across engines; outputs are scaled back /100.
- doubles are rounded to 4 decimals with floor(x*1e4 + 0.5)/1e4 —
  pure IEEE ops, identical in Spark and DuckDB (Spark's F.round goes
  through BigDecimal HALF_UP of the decimal string and disagrees on
  half-boundaries).
- timestamps in outputs become epoch microseconds (bigint):
  Spark `unix_micros(cast(ts as timestamp))` == DuckDB `epoch_us(ts)`.
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.features import IdentityFeature, AggregationFeature
from featuretools_spark.sessionize import session_stats

EV_CUTOFF = dt.datetime(2024, 1, 20)
TPCH_CUTOFF = dt.datetime(1998, 1, 1)


def _cents(col):
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


# ----------------------------------------------------------------------
# EntitySet builders (value/money columns pre-quantized to cents)
# ----------------------------------------------------------------------
def _es_events(spark: SparkSession, sf_dir: str) -> fts.EntitySet:
    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "value", _cents("value")
    )
    users = events.select("user_id").distinct()
    es = fts.EntitySet("events_es")
    es.add_dataframe("users", users, index="user_id")
    es.add_dataframe("events", events, index="event_id", time_index="ts")
    es.add_relationship("users", "user_id", "events", "user_id")
    return es


def _es_tpch(spark: SparkSession, sf_dir: str) -> fts.EntitySet:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumn(
        "c_acctbal", _cents("c_acctbal")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_totalprice", _cents("o_totalprice")
    )
    lineitem = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("l_extendedprice", _cents("l_extendedprice"))
        # discounts are multiples of 0.01: integer basis points make
        # cross-engine float means exact at round4 half-boundaries
        .withColumn("l_discount", _cents("l_discount"))
        .withColumn("_li_id", F.monotonically_increasing_id())
    )
    es = fts.EntitySet("tpch_es")
    es.add_dataframe("customer", customer, index="c_custkey")
    es.add_dataframe("orders", orders, index="o_orderkey",
                     time_index="o_orderdate")
    es.add_dataframe("lineitem", lineitem, index="_li_id",
                     time_index="l_shipdate")
    es.add_relationship("customer", "c_custkey", "orders", "o_custkey")
    es.add_relationship("orders", "o_orderkey", "lineitem", "l_orderkey")
    return es


def _r4(df: DataFrame, cols: list[str]) -> DataFrame:
    """floor(x*1e4 + 0.5)/1e4 — IEEE-identical rounding in both engines."""
    for c in cols:
        x = F.col(c).cast("double")
        df = df.withColumn(
            c, F.floor(x * 10000.0 + F.lit(0.5)).cast("double") / 10000.0
        )
    return df


def _r4e(df: DataFrame, cols: list[str]) -> DataFrame:
    """Epsilon-shifted round4 for columns built by SUMS OF DOUBLES:
    partial-aggregation order varies run to run, so a value landing
    exactly on a .00005 boundary can flip sides; shifting the boundary
    by 1e-6 (on BOTH engines) makes the comparison order-stable."""
    for c in cols:
        x = F.col(c).cast("double")
        df = df.withColumn(
            c,
            F.floor(x * 10000.0 + F.lit(0.5) + F.lit(1e-6)).cast("double")
            / 10000.0,
        )
    return df


def _scale(df: DataFrame, cols: list[str], by: float = 100.0) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("double") / by)
    return df


def _q(name: str):
    """Exact-name column reference (feature names contain dots)."""
    return F.col(f"`{name}`")


def _sel(fm: DataFrame, index_col, renames: dict) -> DataFrame:
    cols = [F.col(index_col)]
    for feat_name, out in renames.items():
        cols.append(_q(feat_name).alias(out))
    return fm.select(*cols)


# ----------------------------------------------------------------------
# queries (engine side)
# ----------------------------------------------------------------------
def q_agg_basic(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    eid = IdentityFeature(es, "events", "event_id")
    feats = [
        AggregationFeature(eid, "users", "count", es=es),
        AggregationFeature(v, "users", "sum", es=es),
        AggregationFeature(v, "users", "mean", es=es),
        AggregationFeature(v, "users", "min", es=es),
        AggregationFeature(v, "users", "max", es=es),
        AggregationFeature(v, "users", "std", es=es),
        AggregationFeature(v, "users", "variance", es=es),
        AggregationFeature(v, "users", "median", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {
        "COUNT(events)": "cnt",
        "SUM(events.value)": "sum_v",
        "MEAN(events.value)": "mean_v",
        "MIN(events.value)": "min_v",
        "MAX(events.value)": "max_v",
        "STD(events.value)": "std_v",
        "VARIANCE(events.value)": "var_v",
        "MEDIAN(events.value)": "med_v",
    })
    out = _scale(out, ["sum_v", "mean_v", "min_v", "max_v", "std_v", "med_v"])
    out = _scale(out, ["var_v"], 10000.0)
    return _r4(out, ["sum_v", "mean_v", "min_v", "max_v", "std_v", "var_v",
                     "med_v"])


def q_agg_time(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    ts = IdentityFeature(es, "events", "ts")
    feats = [
        AggregationFeature(ts, "users", "time_since_last", es=es),
        AggregationFeature(ts, "users", "time_since_first", es=es),
        AggregationFeature(ts, "users", "avg_time_between", es=es),
        AggregationFeature(ts, "users", "first_last_time_delta", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {
        "TIME_SINCE_LAST(events.ts)": "tsl",
        "TIME_SINCE_FIRST(events.ts)": "tsf",
        "AVG_TIME_BETWEEN(events.ts)": "atb",
        "FIRST_LAST_TIME_DELTA(events.ts)": "fltd",
    })
    return _r4(out, ["tsl", "tsf", "atb", "fltd"])


def q_agg_distinct(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    et = IdentityFeature(es, "events", "event_type")
    feats = [
        AggregationFeature(et, "users", "num_unique", es=es),
        AggregationFeature(et, "users", "percent_unique", es=es),
        AggregationFeature(et, "users", "average_count_per_unique", es=es),
        AggregationFeature(et, "users", "entropy", es=es),
        AggregationFeature(et, "users", "mode", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {
        "NUM_UNIQUE(events.event_type)": "n_uniq",
        "PERCENT_UNIQUE(events.event_type)": "pct_uniq",
        "AVERAGE_COUNT_PER_UNIQUE(events.event_type)": "avg_per_uniq",
        "ENTROPY(events.event_type)": "ent",
        "MODE(events.event_type)": "mode_et",
    })
    return _r4(out, ["pct_uniq", "avg_per_uniq", "ent"])


def q_where_clause(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    eid = IdentityFeature(es, "events", "event_id")
    et = IdentityFeature(es, "events", "event_type")
    where = et == "click"
    feats = [
        AggregationFeature(v, "users", "sum", es=es, where=where),
        AggregationFeature(eid, "users", "count", es=es, where=where),
        AggregationFeature(v, "users", "mean", es=es, where=where),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {
        "SUM(events.value WHERE event_type = click)": "sum_click",
        "COUNT(events WHERE event_type = click)": "cnt_click",
        "MEAN(events.value WHERE event_type = click)": "mean_click",
    })
    out = _scale(out, ["sum_click", "mean_click"])
    return _r4(out, ["sum_click", "mean_click"])


def q_training_window(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    eid = IdentityFeature(es, "events", "event_id")
    feats = [
        AggregationFeature(eid, "users", "count", es=es),
        AggregationFeature(v, "users", "sum", es=es),
    ]
    fm = fts.calculate_feature_matrix(
        feats, es, cutoff_time=EV_CUTOFF, training_window="5 days"
    )
    out = _sel(fm, "user_id", {
        "COUNT(events)": "cnt_5d",
        "SUM(events.value)": "sum_5d",
    })
    out = _scale(out, ["sum_5d"])
    return _r4(out, ["sum_5d"])


def q_per_row_cutoffs(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    cuts = (
        es["users"].select("user_id").crossJoin(
            spark.createDataFrame(
                [(dt.datetime(2024, 1, 10),), (dt.datetime(2024, 1, 20),)],
                "time timestamp",
            )
        )
    )
    v = IdentityFeature(es, "events", "value")
    eid = IdentityFeature(es, "events", "event_id")
    feats = [
        AggregationFeature(eid, "users", "count", es=es),
        AggregationFeature(v, "users", "sum", es=es),
        AggregationFeature(v, "users", "max", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    out = fm.select(
        F.col("user_id"),
        F.unix_micros(F.col("time").cast("timestamp")).alias("cutoff_us"),
        _q("COUNT(events)").alias("cnt"),
        _q("SUM(events.value)").alias("sum_v"),
        _q("MAX(events.value)").alias("max_v"),
    )
    out = _scale(out, ["sum_v", "max_v"])
    return _r4(out, ["sum_v", "max_v"])


def q_holistic_wide(spark, sf_dir):
    """Holistic-heavy per-row-cutoff query: four counts-family and two
    flag-family primitives. With round-3 batching the whole thing is
    ONE cutoffs-x-events join for the flag pass plus ONE shared ranked
    value-counts subplan (pre-batching: one join per primitive)."""
    from featuretools_spark.primitives import get_aggregation_primitive

    es = _es_events(spark, sf_dir)
    cuts = (
        es["users"].select("user_id").crossJoin(
            spark.createDataFrame(
                [(dt.datetime(2024, 1, 10),), (dt.datetime(2024, 1, 20),)],
                "time timestamp",
            )
        )
    )
    et = IdentityFeature(es, "events", "event_type")
    v = IdentityFeature(es, "events", "value")
    nmc = get_aggregation_primitive("n_most_common")
    nmc.n = 2
    feats = [
        AggregationFeature(et, "users", "mode", es=es),
        AggregationFeature(et, "users", "entropy", es=es),
        AggregationFeature(et, "users", nmc, es=es),
        AggregationFeature(v, "users", "count_above_mean", es=es),
        AggregationFeature(v, "users", "max_count", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    out = fm.select(
        F.col("user_id"),
        F.unix_micros(F.col("time").cast("timestamp")).alias("cutoff_us"),
        _q("MODE(events.event_type)").alias("mode_et"),
        _q("ENTROPY(events.event_type)").alias("ent"),
        F.concat_ws(",", _q("N_MOST_COMMON(events.event_type)")).alias("top2"),
        _q("COUNT_ABOVE_MEAN(events.value)").alias("cam"),
        _q("MAX_COUNT(events.value)").alias("mxc"),
    )
    return _r4(out, ["ent"])


def q_groupby_trans_agg(spark, sf_dir):
    """Groupby/window transforms OF aggregation outputs (reference
    feature_set_calculator.py:526-592): CUM_SUM(COUNT(orders)) and
    CUM_MAX(SUM(orders.o_totalprice)) partitioned by c_nationkey,
    computed as Window expressions ON the matrix — no extra fact
    pass."""
    from featuretools_spark.features import GroupByTransformFeature
    from featuretools_spark.primitives.transform import CumMax, CumSum

    es = _es_tpch(spark, sf_dir)
    okey = IdentityFeature(es, "orders", "o_orderkey")
    price = IdentityFeature(es, "orders", "o_totalprice")
    cnt = AggregationFeature(okey, "customer", "count", es=es)
    tot = AggregationFeature(price, "customer", "sum", es=es)
    nat = IdentityFeature(es, "customer", "c_nationkey")
    g1 = GroupByTransformFeature(CumSum(), [cnt], groupby=nat)
    g2 = GroupByTransformFeature(CumMax(), [tot], groupby=nat)
    fm = fts.calculate_feature_matrix([cnt, tot, g1, g2], es,
                                      cutoff_time=TPCH_CUTOFF)
    out = _sel(fm, "c_custkey", {
        "COUNT(orders)": "cnt",
        "SUM(orders.o_totalprice)": "sum_p",
        "CUM_SUM(COUNT(orders)) by c_nationkey": "cum_cnt",
        "CUM_MAX(SUM(orders.o_totalprice)) by c_nationkey": "cum_max_p",
    })
    return _scale(out, ["sum_p", "cum_max_p"])


def q_ewm_of_agg(spark, sf_dir):
    """Pandas-kernel transform OF an aggregation output, computed ON
    the matrix (reference feature_set_calculator.py:526-592):
    EWM_AVERAGE(SUM(orders.o_totalprice)) grouped by c_nationkey in
    (cutoff, c_custkey) matrix order — the round-3 NotImplementedError
    at cfm.py matrix_trans is lifted; grouped kernels run applyInPandas
    per group, global ones via the distributed EWM scan."""
    from featuretools_spark.features import GroupByTransformFeature
    from featuretools_spark.primitives.transform import (
        ExponentialWeightedAverage,
    )

    es = _es_tpch(spark, sf_dir)
    price = IdentityFeature(es, "orders", "o_totalprice")
    tot = AggregationFeature(price, "customer", "sum", es=es)
    nat = IdentityFeature(es, "customer", "c_nationkey")
    g = GroupByTransformFeature(
        ExponentialWeightedAverage(com=0.5), [tot], groupby=nat)
    fm = fts.calculate_feature_matrix([tot, g], es, cutoff_time=TPCH_CUTOFF)
    out = fm.select(
        F.col("c_custkey"),
        (_q(tot.get_name()) / 100.0).alias("sum_p"),
        # scale to ~1e2 magnitude (thousands of dollars) so the
        # round-4 epsilon shift dominates the recurrence-vs-weighted-
        # sum fp gap (same regime as the green ewm_by_user oracle)
        (_q(g.get_name()) / 100000.0).alias("ewm_k"),
    )
    return out.withColumn(
        "ewm_k", F.floor(F.col("ewm_k") * 1e4 + 0.5 + 1e-6) / 1e4
    )


def q_trend(spark, sf_dir):
    """reference calculate_trend semantics: dropna pairs, NaN for
    n<=2, 0 when all x equal, slope scaled by the unit dividend of the
    first valid timestamp."""
    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    feats = [AggregationFeature(v, "users", "trend", es=es)]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {"TREND(events.value)": "trend_v"})
    # cents -> dollars and rescale for a round4-meaningful magnitude
    out = out.withColumn("trend_v", F.col("trend_v") * 864.0)
    return _r4(out, ["trend_v"])


def q_first_last(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    feats = [
        AggregationFeature(v, "users", "first", es=es),
        AggregationFeature(v, "users", "last", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {
        "FIRST(events.value)": "first_v",
        "LAST(events.value)": "last_v",
    })
    out = _scale(out, ["first_v", "last_v"])
    return _r4(out, ["first_v", "last_v"])


def q_multihop(spark, sf_dir):
    """customer-grain aggregation over a 2-hop path customer←orders←lineitem."""
    es = _es_tpch(spark, sf_dir)
    price = IdentityFeature(es, "lineitem", "l_extendedprice")
    li = IdentityFeature(es, "lineitem", "_li_id")
    feats = [
        AggregationFeature(li, "customer", "count", es=es),
        AggregationFeature(price, "customer", "sum", es=es),
        AggregationFeature(price, "customer", "mean", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=TPCH_CUTOFF)
    out = _sel(fm, "c_custkey", {
        "COUNT(lineitem)": "n_li",
        "SUM(lineitem.l_extendedprice)": "sum_price",
        "MEAN(lineitem.l_extendedprice)": "mean_price",
    })
    out = _scale(out, ["sum_price", "mean_price"])
    return _r4(out, ["sum_price", "mean_price"])


def q_direct(spark, sf_dir):
    """order-grain direct features pulled down from the customer dim."""
    es = _es_tpch(spark, sf_dir)
    bal = IdentityFeature(es, "customer", "c_acctbal")
    seg = IdentityFeature(es, "customer", "c_mktsegment")
    feats = [
        fts.DirectFeature(bal, "orders", es=es),
        fts.DirectFeature(seg, "orders", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=TPCH_CUTOFF)
    out = _sel(fm, "o_orderkey", {
        "customer.c_acctbal": "cust_bal",
        "customer.c_mktsegment": "cust_seg",
    })
    out = _scale(out, ["cust_bal"])
    return _r4(out, ["cust_bal"])


def q_sessionize(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "value", _cents("value")
    )
    ss = session_stats(events, "user_id", "ts", gap="30 minutes",
                       value_col="value")
    out = ss.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.avg("duration_s").alias("avg_dur"),
        (F.max("sum_value").cast("double") / 100.0).alias("max_sess_value"),
        F.max("n_events").alias("max_sess_events"),
    )
    return _r4(out, ["avg_dur", "max_sess_value"])


def q_window_transforms(spark, sf_dir):
    """event-grain window transforms: lag / diff / cum_sum / rolling mean
    per user in time order (deterministic order → exact parity)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "value", _cents("value")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                         F.col("event_id").asc())
    cum = w.rowsBetween(W.unboundedPreceding, 0)
    roll3 = w.rowsBetween(-2, 0)
    out = events.select(
        "event_id",
        (F.lag("value", 1).over(w).cast("double") / 100.0).alias("lag_v"),
        ((F.col("value") - F.lag("value", 1).over(w)).cast("double") / 100.0
         ).alias("diff_v"),
        (F.sum("value").over(cum).cast("double") / 100.0).alias("cum_v"),
        (F.avg("value").over(roll3).cast("double") / 100.0).alias("roll3_v"),
    )
    return _r4(out, ["lag_v", "diff_v", "cum_v", "roll3_v"])


def q_dfs_depth1(spark, sf_dir):
    """flagship: default-ish DFS at depth 1 over users<-events."""
    es = _es_events(spark, sf_dir)
    fm, feats = fts.dfs(
        entityset=es, target_dataframe_name="users", cutoff_time=EV_CUTOFF,
        agg_primitives=["count", "sum", "mean", "std", "max", "min",
                        "num_unique"],
        trans_primitives=[], max_depth=1,
    )
    out = _sel(fm, "user_id", {
        "COUNT(events)": "cnt",
        "SUM(events.value)": "sum_v",
        "MEAN(events.value)": "mean_v",
        "STD(events.value)": "std_v",
        "MAX(events.value)": "max_v",
        "MIN(events.value)": "min_v",
        "NUM_UNIQUE(events.event_type)": "nu_et",
    })
    out = _scale(out, ["sum_v", "mean_v", "std_v", "max_v", "min_v"])
    return _r4(out, ["sum_v", "mean_v", "std_v", "max_v", "min_v"])


def q_dfs_depth2(spark, sf_dir):
    """full depth-2 DFS walk over customer<-orders<-lineitem: stacked
    aggregations (MEAN(orders.SUM(lineitem.x))), deep-path aggregations
    (SUM(lineitem.x) straight to customer), and aggregations of direct
    features (SUM(lineitem.orders.o_totalprice)) — the reference
    _run_dfs enumeration (deep_feature_synthesis.py:382-531)."""
    es = _es_tpch(spark, sf_dir)
    feats = fts.dfs(
        entityset=es, target_dataframe_name="customer", features_only=True,
        agg_primitives=["sum", "mean", "count"], trans_primitives=[],
        ignore_columns={
            "lineitem": ["l_partkey", "l_suppkey", "l_linenumber",
                         "l_tax", "l_returnflag", "l_linestatus"],
            "customer": ["c_name", "c_nationkey"],
        },
        max_depth=2,
    )
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=TPCH_CUTOFF)
    out = _sel(fm, "c_custkey", {
        "c_acctbal": "cb",
        "c_mktsegment": "seg",
        "SUM(orders.o_totalprice)": "s_tp",
        "MEAN(orders.o_totalprice)": "m_tp",
        "COUNT(orders)": "c_o",
        "SUM(lineitem.l_quantity)": "s_qty",
        "SUM(lineitem.l_extendedprice)": "s_ext",
        "SUM(lineitem.l_discount)": "s_disc",
        "MEAN(lineitem.l_quantity)": "m_qty",
        "MEAN(lineitem.l_extendedprice)": "m_ext",
        "MEAN(lineitem.l_discount)": "m_disc",
        "COUNT(lineitem)": "c_l",
        "SUM(orders.MEAN(lineitem.l_quantity))": "s_o_mqty",
        "SUM(orders.MEAN(lineitem.l_extendedprice))": "s_o_mext",
        "SUM(orders.MEAN(lineitem.l_discount))": "s_o_mdisc",
        "MEAN(orders.SUM(lineitem.l_quantity))": "m_o_sqty",
        "MEAN(orders.SUM(lineitem.l_extendedprice))": "m_o_sext",
        "MEAN(orders.SUM(lineitem.l_discount))": "m_o_sdisc",
        "MEAN(orders.MEAN(lineitem.l_quantity))": "m_o_mqty",
        "MEAN(orders.MEAN(lineitem.l_extendedprice))": "m_o_mext",
        "MEAN(orders.MEAN(lineitem.l_discount))": "m_o_mdisc",
        "MEAN(orders.COUNT(lineitem))": "m_o_cli",
        "SUM(lineitem.orders.o_totalprice)": "s_lo_tp",
        "MEAN(lineitem.orders.o_totalprice)": "m_lo_tp",
    })
    out = _r4(out, ["m_tp", "s_disc", "m_qty", "m_ext", "m_disc",
                    "m_o_sqty", "m_o_sext", "m_o_sdisc", "m_o_cli",
                    "s_qty", "m_lo_tp"])
    # sums/means OF DOUBLES: aggregation order varies run to run, so
    # exact .00005 boundaries need the epsilon-shifted rounding
    out = _r4e(out, ["s_o_mqty", "s_o_mext", "s_o_mdisc",
                     "m_o_mqty", "m_o_mext", "m_o_mdisc"])
    return out


def q_dfs_depth3(spark, sf_dir):
    """full max_depth=3 DFS build over nation<-customer<-orders<-
    lineitem (round 5, VERDICT #7): the whole 36-feature enumeration
    executes (triple-stacked aggregations like
    SUM(customer.MEAN(orders.SUM(lineitem.l_quantity)))); the oracle
    checks a 12-column cross-section spanning every depth, including
    depth-3 stacks and stacks over direct features. Engine defaults:
    sums/counts fill 0 at each grain, means stay null and are
    skipped by the next aggregation up."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumn(
        "c_acctbal", _cents("c_acctbal"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_totalprice", _cents("o_totalprice"))
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "_li_id", F.monotonically_increasing_id())
    es = fts.EntitySet("tpch_d3")
    es.add_dataframe("nation", nation, index="n_nationkey")
    es.add_dataframe("customer", customer, index="c_custkey")
    es.add_dataframe("orders", orders, index="o_orderkey",
                     time_index="o_orderdate")
    es.add_dataframe("lineitem", lineitem, index="_li_id",
                     time_index="l_shipdate")
    es.add_relationship("nation", "n_nationkey", "customer", "c_nationkey")
    es.add_relationship("customer", "c_custkey", "orders", "o_custkey")
    es.add_relationship("orders", "o_orderkey", "lineitem", "l_orderkey")
    feats = fts.dfs(
        entityset=es, target_dataframe_name="nation", features_only=True,
        agg_primitives=["sum", "mean", "count"], trans_primitives=[],
        ignore_columns={
            "lineitem": ["l_partkey", "l_suppkey", "l_linenumber", "l_tax",
                         "l_returnflag", "l_linestatus", "l_extendedprice",
                         "l_discount"],
            "customer": ["c_name", "c_mktsegment"],
            "orders": ["o_orderstatus", "o_orderpriority"],
            "nation": ["n_name", "n_comment"],
        },
        max_depth=3,
    )
    assert len(feats) == 36, len(feats)
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=TPCH_CUTOFF)
    out = _sel(fm, "n_nationkey", {
        "n_regionkey": "reg",
        "MEAN(customer.c_acctbal)": "m_cb",
        "COUNT(customer)": "c_c",
        "SUM(orders.o_totalprice)": "s_tp",
        "SUM(lineitem.l_quantity)": "s_qty",
        "MEAN(customer.SUM(orders.o_totalprice))": "m_c_stp",
        "MEAN(customer.COUNT(orders))": "m_c_co",
        "SUM(customer.MEAN(orders.SUM(lineitem.l_quantity)))": "s_c_mosq",
        "MEAN(customer.MEAN(orders.MEAN(lineitem.l_quantity)))": "m_c_momq",
        "MEAN(customer.MEAN(orders.COUNT(lineitem)))": "m_c_mocl",
        "MEAN(customer.SUM(lineitem.orders.o_totalprice))": "m_c_slotp",
        "SUM(customer.MEAN(lineitem.orders.o_totalprice))": "s_c_mlotp",
    })
    out = _r4(out, ["m_cb", "s_qty", "m_c_stp", "m_c_co", "m_c_slotp"])
    out = _r4e(out, ["s_c_mosq", "m_c_momq", "m_c_mocl", "s_c_mlotp"])
    return out


def q_use_previous_obs(spark, sf_dir):
    """observation-count window: mean over the last 3 events per user."""
    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    feats = [
        AggregationFeature(v, "users", "mean", es=es, use_previous="3 o"),
        AggregationFeature(v, "users", "sum", es=es, use_previous="3 o"),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {
        "MEAN(events.value, Last 3 Observations)": "mean_3o",
        "SUM(events.value, Last 3 Observations)": "sum_3o",
    })
    out = _scale(out, ["mean_3o", "sum_3o"])
    return _r4(out, ["mean_3o", "sum_3o"])


def q_exclude_cutoff(spark, sf_dir):
    """include_cutoff_time=False with each user's cutoff exactly at its
    last event time: that event must be excluded."""
    es = _es_events(spark, sf_dir)
    cuts = es["events"].groupBy("user_id").agg(F.max("ts").alias("time"))
    eid = IdentityFeature(es, "events", "event_id")
    v = IdentityFeature(es, "events", "value")
    feats = [
        AggregationFeature(eid, "users", "count", es=es),
        AggregationFeature(v, "users", "sum", es=es),
    ]
    fm = fts.calculate_feature_matrix(
        feats, es, cutoff_time=cuts, include_cutoff_time=False
    )
    out = fm.select(
        F.col("user_id"),
        F.unix_micros(F.col("time").cast("timestamp")).alias("cutoff_us"),
        _q("COUNT(events)").alias("cnt_excl"),
        _q("SUM(events.value)").alias("sum_excl"),
    )
    out = _scale(out, ["sum_excl"])
    return _r4(out, ["sum_excl"])


def q_engine_transforms(spark, sf_dir):
    """event-grain transforms THROUGH the engine: lag + per-event_type
    cumulative sum (GroupByTransformFeature)."""
    from featuretools_spark.features import (
        GroupByTransformFeature, TransformFeature,
    )

    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    et = IdentityFeature(es, "events", "event_type")
    lag = TransformFeature("lag", [v])
    cum_by_type = GroupByTransformFeature("cum_sum", [v], groupby=et)
    fm = fts.calculate_feature_matrix(
        [lag, cum_by_type], es, cutoff_time=dt.datetime(2024, 3, 1)
    )
    out = fm.select(
        F.col("event_id"),
        _q("LAG(value)").alias("lag_v"),
        _q("CUM_SUM(value) by event_type").alias("cum_by_type"),
    )
    out = _scale(out, ["lag_v", "cum_by_type"])
    return _r4(out, ["lag_v", "cum_by_type"])


def q_ewm_by_user(spark, sf_dir):
    """exponential_weighted_average per user: the pandas-kernel path
    partitioned by the entity key (scale-safe applyInPandas — one
    group per user, never a global single group)."""
    from featuretools_spark.features import GroupByTransformFeature
    from featuretools_spark.primitives.transform import (
        ExponentialWeightedAverage,
    )

    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    uid = IdentityFeature(es, "events", "user_id")
    ewm = GroupByTransformFeature(
        ExponentialWeightedAverage(com=0.5), [v], groupby=uid
    )
    fm = fts.calculate_feature_matrix(
        [ewm], es, cutoff_time=dt.datetime(2024, 3, 1)
    )
    out = fm.select(
        F.col("event_id"),
        (_q(ewm.get_name()) / 100.0).alias("ewm_v"),
    )
    # EWM values are dyadic rationals landing EXACTLY on .00005
    # boundaries; pandas' recurrence and the oracle's explicit weighted
    # sum differ by ~1e-12 there, so shift the rounding boundary by an
    # epsilon on BOTH sides instead of plain half-up
    return out.withColumn(
        "ewm_v", F.floor(F.col("ewm_v") * 1e4 + 0.5 + 1e-6) / 1e4
    )


def q_lti(spark, sf_dir):
    """last-time-index: customer LTI = max event time of the customer
    row or any descendant (orders, lineitems)."""
    es = _es_tpch(spark, sf_dir)
    es.add_last_time_indexes()
    lti = es["customer"].select(
        "c_custkey",
        F.unix_micros(F.col("_ft_last_time").cast("timestamp")).alias("lti_us"),
    )
    return lti


def q_n_most_common(spark, sf_dir):
    """top-2 most common event types per user (NMostCommon primitive),
    emitted as a comma-joined string for stable comparison."""
    from featuretools_spark.primitives import get_aggregation_primitive

    es = _es_events(spark, sf_dir)
    et = IdentityFeature(es, "events", "event_type")
    prim = get_aggregation_primitive("n_most_common")
    prim.n = 2
    feats = [AggregationFeature(et, "users", prim, es=es)]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = fm.select(
        F.col("user_id"),
        F.concat_ws(",", _q("N_MOST_COMMON(events.event_type)")).alias("top2"),
    )
    return out


def q_dedup_exact(spark, sf_dir):
    """exact duplicate detection on documents.text."""
    from featuretools_spark.ops.dedup import exact_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = exact_duplicates(docs, ["text"], "doc_id")
    return out.select(
        "doc_id", "dup_count", F.col("is_duplicate").cast("int").alias("is_dup")
    )


def q_text_quality(spark, sf_dir):
    """document quality signals (length / words / ratios / score)."""
    from featuretools_spark.ops.textstats import quality_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_features(docs, "text")
    return out.select(
        "doc_id",
        F.col("n_chars_calc").cast("long").alias("n_chars_calc"),
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len", "punct_ratio", "stopword_ratio",
    )


def q_token_count(spark, sf_dir):
    """token counting: whitespace + BPE-ish regex pre-tokenizer."""
    from featuretools_spark.ops.textstats import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        token_count(F.col("text"), "whitespace").cast("long").alias("ws_tokens"),
        token_count(F.col("text"), "bpe").cast("long").alias("bpe_tokens"),
    )


def q_token_count_bpe(spark, sf_dir):
    """Real merge-rank BPE token count (VERDICT r6 #5): the general
    lowest-rank-pair priority loop over a broadcast merge table,
    memoized per distinct word, zero shuffle. The witness vocab's
    merge outputs are consumed only by later merges, so DuckDB
    replays the exact count as a rank-ordered replace() chain with
    one sentinel char per merged symbol (see
    ops/textstats.py:WITNESS_BPE_MERGES for the equivalence
    argument)."""
    from featuretools_spark.ops.textstats import (
        WITNESS_BPE_MERGES, bpe_token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_token_count(docs, "doc_id", "text", WITNESS_BPE_MERGES)


def q_quality_classifier(spark, sf_dir):
    """fastText-style linear classifier inference (VERDICT r6 stretch
    #9): hashed word-unigram+bigram features, sigmoid(bias + mean
    gram weight). Witness mode — per-gram weights injected from
    md5-hex prefixes (int/2^32 - 0.5: every term and every partial
    sum exact in double, so linear_score is order-independent and
    DuckDB replays it bit-for-bit; only the sigmoid goes through
    libm, quantized half-up to 4 decimals on both sides)."""
    from featuretools_spark.ops.classify import classifier_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return classifier_score(docs, "doc_id", "text", bias=0.25)


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test split by key hash (durable across
    re-runs, partitioning and engines — Spark's own sample/sampleBy
    are seed+partition dependent). md5 witness mode: u = md5 hex
    prefix / 2^32 is integer/2^32 (exact in double) and the
    0.75/0.125/0.125 boundaries are exact binary fractions, so split
    membership replays bit-for-bit in DuckDB with zero boundary
    ambiguity."""
    from featuretools_spark.ops.split import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hash_split(
        docs, "doc_id",
        [("train", 0.75), ("val", 0.125), ("test", 0.125)],
        seed="r7", hash_fn="md5",
    )
    return out.select("doc_id", "split")


def q_pack_chunks(spark, sf_dir):
    """GPT-style concat-and-slice sequence packing: placement of each
    document's stream slice into fixed 2048-position training chunks.
    Exclusive prefix sum runs as a segmented scan (per-partition
    window + bounded driver carry, the distributed-EWM shape), NOT a
    one-task global window; all-integer arithmetic, exactly
    replayable by a single window cumsum in DuckDB."""
    from featuretools_spark.ops.pack import pack_causal_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_causal_chunks(docs, "doc_id", "n_chars", 2048)


def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation COMPOSITION as one lazy plan — the shape a
    real corpus job runs, each stage an already-oracle-verified op:
    exact-dedup canonical survivors (sha2 content hash, min-id keep)
    -> PII redaction chain -> fastText-witness quality gate (keep
    rounded linear_score >= 0 — the pre-round value is exact in
    double on both engines, so the gate replays bit-for-bit) ->
    deterministic md5 hash split. Proves the ops compose: schemas
    line up, no stage forces materialization, and the whole pipeline
    remains DuckDB-replayable."""
    from featuretools_spark.ops.classify import classifier_score
    from featuretools_spark.ops.dedup import exact_duplicates
    from featuretools_spark.ops.scrub import redact_pii
    from featuretools_spark.ops.split import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    canon = (
        exact_duplicates(docs, ["text"], "doc_id")
        .filter(~F.col("is_duplicate"))
        .select("doc_id", "text")
    )
    red = redact_pii(canon, "text").select("doc_id", "redacted")
    scored = classifier_score(red, "doc_id", "redacted")
    kept = scored.filter(F.col("linear_score") >= 0.0)
    return hash_split(
        kept, "doc_id",
        [("train", 0.75), ("val", 0.125), ("test", 0.125)],
        seed="pipe", hash_fn="md5",
    ).select("doc_id", "n_grams", "linear_score", "quality_prob", "split")


def q_lang_id(spark, sf_dir):
    """stopword-heuristic language ID per document."""
    from featuretools_spark.ops.textstats import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", language_id(F.col("text")).alias("lang_pred"))


def q_ann_brute_topk(spark, sf_dir):
    """exact cosine top-5 neighbours for the first 5 vectors."""
    from featuretools_spark.ops.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(
        emb.filter(F.col("vec_id") >= 5), queries,
        id_col="vec_id", vec_col="embedding", k=5,
    )
    return _r4(
        out.select("query_id", "vec_id", "score",
                   F.col("rank").cast("long").alias("rank")),
        ["score"],
    )


def q_minhash_dedup(spark, sf_dir):
    """MinHash-LSH near-dup detection, WITNESS mode (round 5): LSH
    candidates are re-scored with the exact 5-gram Jaccard, so the
    output (id_a, id_b, jaccard) is a pure function of the corpus —
    the DuckDB oracle recomputes it from raw text, witnessing both
    LSH recall at the threshold and the exact verifier. The
    signature/banding machinery itself stays hash-specific and keeps
    its planted recall/precision pytest gate."""
    from featuretools_spark.ops.dedup import minhash_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = minhash_duplicates(docs, "doc_id", "text", num_perm=32,
                             bands=8, threshold=0.5, verify="exact")
    return _r4(out, ["jaccard"])


def q_simhash_dedup(spark, sf_dir):
    """SimHash near-dup pairs, WITNESS mode v2 (round 6): md5-derived
    token bits make the signature engine-agnostic, so the DuckDB
    oracle rebuilds the IDENTICAL signatures, pigeonhole chunks,
    hamming distances, and exact 7-gram Jaccard re-score — the check
    is exact at ANY scale (the round-5 oracle instead claimed the
    hamming<=10 gate passes every true J>=0.5 pair, a corpus-margin
    property that tools/check_sf1_tiling.py measured flipping 2-4
    pairs per hash-perturbed corpus at sf0.1 scale). Planted-pair
    recall stays pinned by the witness-margin pytests."""
    from featuretools_spark.ops.dedup import simhash_near_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = simhash_near_duplicates(docs, "doc_id", "text", max_hamming=10,
                                  verify_jaccard=0.5, shingle_k=7,
                                  hash_fn="md5")
    return _r4(out, ["jaccard"])


def q_ngram_jaccard(spark, sf_dir):
    """exact 5-gram Jaccard of each doc with the next doc id —
    a linear-chain verification of the shingle machinery."""
    from featuretools_spark.ops.dedup import shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = docs.select("doc_id", shingles(F.col("text"), 5).alias("sh"))
    nxt = sh.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("sh").alias("sh_next")
    )
    j = sh.join(nxt, "doc_id")
    inter = F.size(F.array_intersect("sh", "sh_next")).cast("double")
    union = F.size(F.array_union("sh", "sh_next")).cast("double")
    return _r4(
        j.select("doc_id", (inter / union).alias("jaccard")), ["jaccard"]
    )


def q_approximate(spark, sf_dir):
    """approximate cutoff binning (2-day windows): aggregates computed
    once per (user, bin floor) — the reference's approximate path."""
    es = _es_events(spark, sf_dir)
    cuts = (
        es["users"].select("user_id").crossJoin(
            spark.createDataFrame(
                [(dt.datetime(2024, 1, 15, 6),),
                 (dt.datetime(2024, 1, 15, 18),),
                 (dt.datetime(2024, 1, 19),)],
                "time timestamp",
            )
        )
    )
    v = IdentityFeature(es, "events", "value")
    eid = IdentityFeature(es, "events", "event_id")
    feats = [
        AggregationFeature(eid, "users", "count", es=es),
        AggregationFeature(v, "users", "sum", es=es),
    ]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts,
                                      approximate="2 days")
    out = fm.select(
        F.col("user_id"),
        F.unix_micros(F.col("time").cast("timestamp")).alias("cutoff_us"),
        _q("COUNT(events)").alias("cnt_approx"),
        _q("SUM(events.value)").alias("sum_approx"),
    )
    out = _scale(out, ["sum_approx"])
    return _r4(out, ["sum_approx"])


def q_output_slice(spark, sf_dir):
    """multi-output primitive + FeatureOutputSlice: 1st and 2nd most
    common event types as separate columns."""
    from featuretools_spark.features import FeatureOutputSlice
    from featuretools_spark.primitives import get_aggregation_primitive

    es = _es_events(spark, sf_dir)
    et = IdentityFeature(es, "events", "event_type")
    prim = get_aggregation_primitive("n_most_common")
    prim.n = 2
    nmc = AggregationFeature(et, "users", prim, es=es)
    s0, s1 = FeatureOutputSlice(nmc, 0), FeatureOutputSlice(nmc, 1)
    fm = fts.calculate_feature_matrix([s0, s1], es, cutoff_time=EV_CUTOFF)
    return fm.select(
        F.col("user_id"),
        _q(s0.get_name()).alias("top1"),
        _q(s1.get_name()).alias("top2"),
    )


def q_temporal_cutoffs(spark, sf_dir):
    """make_temporal_cutoffs: 3 weekly windows back from 2024-01-22,
    count of events per (user, window)."""
    from featuretools_spark.time_utils import make_temporal_cutoffs

    es = _es_events(spark, sf_dir)
    labels = es["users"].select(
        "user_id", F.lit(dt.datetime(2024, 1, 22)).alias("time")
    )
    cuts = make_temporal_cutoffs(labels, "user_id", window_size="7 days",
                                 num_windows=3)
    eid = IdentityFeature(es, "events", "event_id")
    feats = [AggregationFeature(eid, "users", "count", es=es)]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)
    return fm.select(
        F.col("user_id"),
        F.unix_micros(F.col("time").cast("timestamp")).alias("cutoff_us"),
        _q("COUNT(events)").alias("cnt"),
    )


def q_custom_primitive(spark, sf_dir):
    """user-defined aggregation primitive (sum of squares) through the
    full engine path — the UDF surface."""
    from featuretools_spark.primitives.base import AggregationPrimitive

    class SumOfSquares(AggregationPrimitive):
        name = "sum_of_squares"
        default_value = 0

        def expr(self, inputs, ctx):
            x = inputs[0].cast("double")
            return F.sum(x * x)

    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    f = AggregationFeature(v, "users", SumOfSquares(), es=es)
    fm = fts.calculate_feature_matrix([f], es, cutoff_time=EV_CUTOFF)
    out = fm.select(
        F.col("user_id"),
        _q("SUM_OF_SQUARES(events.value)").alias("ssq"),
    )
    out = _scale(out, ["ssq"], 10000.0)
    return _r4(out, ["ssq"])


def q_lsh_topk(spark, sf_dir):
    """random-hyperplane LSH ANN, WITNESS mode (round 5):
    hash_fn="md5" derives plane components from md5 hex (engine-
    agnostic), so the DuckDB oracle rebuilds the identical planes,
    sign-bit signatures, 4-bit bands, candidate sets, and final
    cosine-ranked neighbors — the approximation itself is checked
    end-to-end, not just row counts. The murmur3 fast path keeps its
    recall@5 >= 0.9 pytest gate."""
    from featuretools_spark.ops.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(emb.filter(F.col("vec_id") >= 3), queries,
                   id_col="vec_id", vec_col="embedding", k=5, n_planes=12,
                   hash_fn="md5")
    return _r4(
        out.select("query_id", "vec_id", "score",
                   F.col("rank").cast("long").alias("rank")),
        ["score"],
    )


def q_fingerprint(spark, sf_dir):
    """Document fingerprints. Round 4: hash_fn="md5" — the SAME
    normalization + k-gram winnowing structure as the xxhash64 scale
    path, but with engine-agnostic hex hashes so DuckDB recomputes
    every value (the xxhash64 path keeps its determinism/monotonicity
    pytest gate)."""
    from featuretools_spark.ops.textstats import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return fingerprint(docs, "doc_id", "text", hash_fn="md5")


def q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k, WITNESS mode (round 5): the coarse
    quantizer is a deterministic corpus sample (embeddings of
    vec_id 31,62,...,496 — a legitimate sample-based quantizer, no
    Lloyd refinement), injected via ivf_topk(centroids=...). With
    SQL-reproducible centroids, the ENTIRE IVF pipeline — nearest-
    centroid assignment, n_probe list selection, candidate join,
    exact cosine re-rank — is recomputed by the DuckDB oracle, so
    approximation choices (which neighbors IVF returns at n_probe=4
    of 16 lists) are checked exactly, not just row counts. The
    k-means trainer itself stays engine-specific and is gated by
    test_dedup_quality.test_ivf_topk_recall_on_clustered_data +
    the determinism/plan-size pytests."""
    from featuretools_spark.ops.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(
            (F.col("vec_id") % 31 == 0) & F.col("vec_id").between(31, 496)
        ).orderBy("vec_id").select("embedding").collect()
    ]
    out = ivf_topk(emb.filter(F.col("vec_id") >= 5), queries,
                   id_col="vec_id", vec_col="embedding", k=5,
                   n_probe=4, centroids=cents)
    return _r4(
        out.select("query_id", "vec_id", "score",
                   F.col("rank").cast("long").alias("rank")),
        ["score"],
    )


def q_ewm_global(spark, sf_dir):
    """GLOBAL exponential_weighted_average (no entity partition) —
    executes through ewm.ewm_global's two-pass segmented prefix scan
    across range partitions (the r3 scale path that replaced the
    single-group pandas collapse). Subset to 3k rows so the DuckDB
    prefix-fold oracle stays O(n*k)."""
    from featuretools_spark.primitives.transform import (
        ExponentialWeightedAverage,
    )

    from featuretools_spark.features import TransformFeature

    es = _es_events(spark, sf_dir)
    ev = es["events"].filter(F.col("event_id") < 3000)
    es2 = fts.EntitySet("ewmg")
    es2.add_dataframe("events", ev, index="event_id", time_index="ts")
    v = IdentityFeature(es2, "events", "value")
    ewm = TransformFeature(ExponentialWeightedAverage(com=0.5), [v])
    fm = fts.calculate_feature_matrix(
        [ewm], es2, cutoff_time=dt.datetime(2024, 3, 1)
    )
    out = fm.select(
        F.col("event_id"),
        (_q(ewm.get_name()) / 100.0).alias("ewm_v"),
    )
    return _r4e(out, ["ewm_v"])


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing through the driver surface: documents'
    text bytes as an opaque binary payload -> Arrow-batched
    mapInPandas decode/feature-extract. Round 4: REAL oracle — the
    checked columns (payload byte length + md5 computed INSIDE the
    pandas batch) witness byte-exact Arrow pass-through and are
    recomputable by any SQL engine; the PNG codec itself is real
    (stdlib zlib) and pytest-gated, non-PNG embedding remains the
    declared deterministic stub."""
    from featuretools_spark.ops.multimodal import image_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    out = image_features(media, payload_col="payload",
                         id_col="media_id", n_features=8,
                         hash_payload=True)
    return out.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "payload_md5",
    )


def q_embedding_dedup(spark, sf_dir):
    """embedding-cosine near-dup pairs, exact all-pairs method (the
    LSH path's correctness oracle; reference has no analogue — this
    is part of the training-data-pipeline surface)."""
    from featuretools_spark.ops.dedup import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_near_duplicates(
        emb, "vec_id", "embedding", threshold=0.35, method="exact"
    )
    return _r4(out, ["cos"])


def q_audio_features(spark, sf_dir):
    """Audio path end-to-end (NEW r4): deterministic 16-bit PCM WAVs
    generated per doc_id in one mapInPandas, decoded by the REAL
    stdlib WAV codec (decode_wav) in a second — strict mode, no stub.
    Oracle columns are pure arithmetic on doc_id (header size + PCM
    length + duration), witnessing the distributed roundtrip; rms/
    peak correctness vs numpy is pytest-gated (test_io_multimodal)."""
    import numpy as np
    import pandas as pd

    from featuretools_spark.ops.multimodal import audio_features, encode_wav
    from featuretools_spark.ops.width import ensure_min_width

    # the id column scans as ONE split (bytes-sized), but the work is
    # a per-row codec roundtrip — floor the width so the encode+decode
    # stage uses every core (ops/width.py rationale; r8)
    docs = ensure_min_width(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            ns = (2000 + (ids % 7) * 500).tolist()
            payloads = [
                encode_wav(0.25 * np.sin(np.arange(k) * 0.1), 8000)
                for k in ns
            ]
            yield pd.DataFrame({"media_id": ids.astype(str),
                                "payload": payloads})

    media = docs.mapInPandas(gen, "media_id string, payload binary")
    out = audio_features(media, strict=True)
    return out.select("media_id", "n_bytes", "sample_rate",
                      "n_samples", "duration_s")


def q_video_features(spark, sf_dir):
    """Video path end-to-end (NEW r5): deterministic MJPEG-in-AVI
    videos generated per doc_id in one mapInPandas (in-repo baseline
    JPEG encoder + RIFF/AVI writer, ops/avi.py), then parsed by the
    REAL stdlib container decoder in a second — strict mode, no stub.
    Oracle columns are pure arithmetic on doc_id (frame counts,
    rational fps, duration), witnessing that the container round-trips
    through Arrow and the parser reads the movi chunk list it was
    given; frame PIXEL correctness vs the encoder input is
    pytest-gated (test_io_multimodal), same split as audio_features."""
    import numpy as np
    import pandas as pd

    from featuretools_spark.ops.multimodal import video_features
    from featuretools_spark.ops.avi import encode_avi_mjpeg
    from featuretools_spark.ops.width import ensure_min_width

    # same width floor as q_audio_features: per-row codec work behind
    # a one-split id scan (r8)
    docs = ensure_min_width(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                nf = 2 + int(i) % 4
                frames = [
                    np.full((8, 16), (37 * int(i) + 29 * f) % 256,
                            np.uint8)
                    for f in range(nf)
                ]
                payloads.append(encode_avi_mjpeg(frames, fps=5.0))
            yield pd.DataFrame({"media_id": ids.astype(str),
                                "payload": payloads})

    media = docs.mapInPandas(gen, "media_id string, payload binary")
    out = video_features(media, strict=True)
    return out.select("media_id", "width", "height", "n_frames",
                      "fps", "duration_s")


def q_direct_chain(spark, sf_dir):
    """Multi-hop direct chain region -> nation -> customer: the bare
    2-hop direct (nation.region.r_name) plus a transform-of-direct at
    the intermediate grain (nation.NUM_CHARACTERS(region.r_name)) —
    the depth-3 shapes the round-3 verdict flagged as raising
    (reference builds both via deep_feature_synthesis.py steps 6+7)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    es = fts.EntitySet("chain_es")
    es.add_dataframe("region", region, index="r_regionkey")
    es.add_dataframe("nation", nation, index="n_nationkey")
    es.add_dataframe("customer", customer, index="c_custkey")
    es.add_relationship("region", "r_regionkey", "nation", "n_regionkey")
    es.add_relationship("nation", "n_nationkey", "customer", "c_nationkey")

    from featuretools_spark.primitives import get_transform_primitive

    rname = IdentityFeature(es, "region", "r_name")
    d1 = fts.DirectFeature(rname, "nation", es=es)
    mh = fts.DirectFeature(d1, "customer", es=es)
    tlen = fts.TransformFeature(
        get_transform_primitive("num_characters"), [d1])
    td = fts.DirectFeature(tlen, "customer", es=es)
    fm = fts.calculate_feature_matrix([mh, td], es,
                                      cutoff_time=TPCH_CUTOFF)
    return _sel(fm, "c_custkey", {
        mh.get_name(): "region_name",
        td.get_name(): "region_name_len",
    }).withColumn("region_name_len",
                  F.col("region_name_len").cast("bigint"))


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER resolution (NEW r4): connected components over
    the exact-cosine pair graph via iterative min-label propagation —
    A~B, B~C collapse to one cluster even when A~C was never a pair.
    Oracle: DuckDB recursive CTE over the same pairs."""
    from featuretools_spark.ops.dedup import (
        duplicate_clusters, embedding_near_duplicates,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_duplicates(
        emb, "vec_id", "embedding", threshold=0.35, method="exact"
    )
    return duplicate_clusters(pairs).select(
        F.col("id").cast("long").alias("id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


#: deterministic PII payload appended to every document for the
#: redaction query — the driver corpus contains no organic PII, so the
#: query injects some (a pure function of doc_id, identical SQL) and
#: the redactor must find exactly it plus any organic matches
_PII_INJECT = (
    " contact user{id}@example.com tel 555-867-{pad} "
    "ssn 123-45-6789 ip 10.0.0.{oct}"
)


def q_redact_pii(spark, sf_dir):
    """PII redaction (NEW r6, ops/scrub.py): regexp chain over the
    Java-regex ∩ RE2 common subset — counts on the original text,
    fixed replacement order, all whole-stage-codegen Column
    expressions. The corpus carries no organic PII, so a
    deterministic payload (function of doc_id) is appended in BOTH
    engines; the oracle re-runs the identical chain in DuckDB."""
    from featuretools_spark.ops.scrub import redact_pii
    from featuretools_spark.ops.width import ensure_min_width

    # 8 regex passes per row behind a one-split byte-sized scan: floor
    # the width so the codegen map uses every core (r8; the op itself
    # stays a pure zero-shuffle map)
    docs = ensure_min_width(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com tel 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ssn 123-45-6789 ip 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    out = redact_pii(injected, "text")
    return out.select(
        "doc_id", "redacted",
        *[F.col(f"n_{k}").cast("long").alias(f"n_{k}")
          for k in ("email", "ssn", "phone", "ipv4")],
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (NEW r6, ops/scrub.py): word-5-gram
    overlap against a deterministic in-corpus benchmark slice
    (doc_id % 97 == 0); the corpus side is explode + broadcast
    semi-join, no corpus shuffle. Oracle recomputes grams and overlap
    with DuckDB list functions."""
    from featuretools_spark.ops.scrub import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench, "doc_id", "text", n=5)


def q_cross_dup(spark, sf_dir):
    """Cross-document duplicated-span fraction
    (ops/dedup.py:cross_doc_duplication): winnowed md5 k-gram
    fingerprints (r7 — content-defined anchors replace r6's strided
    sampling, whose floor claim failed on offsets differing mod
    stride), doc-frequency join — the dataset-analysis counterpart of
    exact-substring dedup, linear in corpus size."""
    from featuretools_spark.ops.dedup import cross_doc_duplication

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cross_doc_duplication(docs, "doc_id", "text", k=20, w=8)


def q_dedup_spans(spark, sf_dir):
    """Exact-substring span REMOVAL (NEW r7,
    ops/dedup.py:trim_duplicated_spans): winnowed fingerprints with
    doc-frequency >= 2 become merged char intervals, cut out of the
    text in one fold — the Lee-et-al.-style curation action behind
    the cross_dup signal. Oracle recomputes the interval merge AND
    the trimmed text md5."""
    from featuretools_spark.ops.dedup import trim_duplicated_spans
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = trim_duplicated_spans(docs, "doc_id", "text", k=20, w=8)
    return out.select(
        "doc_id", "n_dup_spans", "chars_removed",
        F.length("text").cast("long").alias("trimmed_len"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("trimmed_md5"),
    )


def q_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (NEW r6,
    ops/textstats.py): word-bigram totals, top-ngram fraction,
    duplicated-ngram fraction — one explode + two map-side-combinable
    groupBys, shuffles only (id, gram) counts."""
    from featuretools_spark.ops.textstats import repetition_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_features(docs, "doc_id", "text", n=2)


def q_corr_matrix(spark, sf_dir):
    """One-pass Gram-matrix pairwise-complete Pearson correlation
    (NEW r6, encode.py:_corr_matrix_gram): four p x p GEMM partials
    per partition via mapInArrow (pair-valid counts, masked sums /
    square sums, cross products), treeReduce, closed form — the scale
    path behind remove_highly_correlated_features(method="gram"),
    whose pairwise-F.corr plan is quadratic in width (~500k agg
    expressions at 1k columns). Oracle: DuckDB corr() per pair on the
    same lineitem columns. Greedy drop-set equivalence vs the
    pairwise path is pytest-gated (test_round6)."""
    from featuretools_spark.encode import _corr_matrix_gram

    import math

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*cols)
    m = _corr_matrix_gram(li, cols)
    rows = [
        # same half-up 4-decimal quantization as the oracle's _R
        (cols[i], cols[j],
         math.floor(float(m[i, j]) * 10000 + 0.5) / 10000)
        for i in range(len(cols)) for j in range(i + 1, len(cols))
    ]
    return spark.createDataFrame(
        rows, "col_a string, col_b string, corr double")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_dfs_depth1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "agg_basic": q_agg_basic,
        "agg_time": q_agg_time,
        "agg_distinct": q_agg_distinct,
        "where_clause": q_where_clause,
        "training_window": q_training_window,
        "per_row_cutoffs": q_per_row_cutoffs,
        "trend": q_trend,
        "first_last": q_first_last,
        "multihop": q_multihop,
        "direct": q_direct,
        "sessionize": q_sessionize,
        "window_transforms": q_window_transforms,
        "dfs_depth1": q_dfs_depth1,
        "dfs_depth2": q_dfs_depth2,
        "dfs_depth3": q_dfs_depth3,
        "use_previous_obs": q_use_previous_obs,
        "exclude_cutoff": q_exclude_cutoff,
        "engine_transforms": q_engine_transforms,
        "ewm_by_user": q_ewm_by_user,
        "lti": q_lti,
        "n_most_common": q_n_most_common,
        "dedup_exact": q_dedup_exact,
        "text_quality": q_text_quality,
        "token_count": q_token_count,
        "token_count_bpe": q_token_count_bpe,
        "quality_classifier": q_quality_classifier,
        "hash_split": q_hash_split,
        "pack_chunks": q_pack_chunks,
        "curation_pipeline": q_curation_pipeline,
        "lang_id": q_lang_id,
        "ann_brute_topk": q_ann_brute_topk,
        "minhash_dedup": q_minhash_dedup,
        "simhash_dedup": q_simhash_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "approximate": q_approximate,
        "output_slice": q_output_slice,
        "temporal_cutoffs": q_temporal_cutoffs,
        "custom_primitive": q_custom_primitive,
        "lsh_topk": q_lsh_topk,
        "fingerprint": q_fingerprint,
        "embedding_dedup": q_embedding_dedup,
        "ivf_topk": q_ivf_topk,
        "multimodal_features": q_multimodal_features,
        "ewm_global": q_ewm_global,
        "holistic_wide": q_holistic_wide,
        "groupby_trans_agg": q_groupby_trans_agg,
        "ewm_of_agg": q_ewm_of_agg,
        "dedup_clusters": q_dedup_clusters,
        "direct_chain": q_direct_chain,
        "audio_features": q_audio_features,
        "video_features": q_video_features,
        "corr_matrix": q_corr_matrix,
        "redact_pii": q_redact_pii,
        "decontaminate": q_decontaminate,
        "repetition": q_repetition,
        "cross_dup": q_cross_dup,
        "dedup_spans": q_dedup_spans,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------
_EV = "TIMESTAMP '2024-01-20 00:00:00'"
_TP = "TIMESTAMP '1998-01-01 00:00:00'"
_U = "(SELECT DISTINCT user_id FROM events)"
# events with value quantized to cents (matches the Spark-side ES)
_EC = ("(SELECT * REPLACE (CAST(floor(value*100 + 0.5) AS BIGINT) AS value) "
       "FROM events)")



def _sqlstr(pat: str) -> str:
    """Python string -> quoted SQL string literal."""
    return "'" + pat.replace("'", "''") + "'"


_BPE_SQL = _sqlstr(
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"
)
_PUNCT_SQL = _sqlstr(
    "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"
)
_EN_STOP_SQL = "('the','and','of','to','in','is','that','for','with','was')"
_MWL_EXPR = (
    "CASE WHEN n_words > 0 THEN list_aggregate(list_transform("
    "string_split_regex(trim(text), '" + chr(92) + "s+'), x -> length(x)), "
    "'sum')::DOUBLE / n_words END"
)
_PUNCT_EXPR = (
    f"len(regexp_extract_all(text, {_PUNCT_SQL}))::DOUBLE "
    "/ greatest(n_chars_calc, 1)"
)
_STOP_EXPR = (
    f"len(list_filter(ww, x -> x IN {_EN_STOP_SQL}))::DOUBLE "
    "/ greatest(n_words, 1)"
)


def _R(e: str) -> str:
    return f"floor(({e})*10000 + 0.5)/10000"


def _redact_pii_oracle() -> str:
    """DuckDB reproduction of q_redact_pii: identical injected
    payload, identical regex chain (PII_PATTERNS is the single source
    of truth — the Java-regex ∩ RE2 subset), counts on the original
    text, replacements in the same fixed order."""
    from featuretools_spark.ops.scrub import PII_PATTERNS as P

    kinds = ("email", "ssn", "phone", "ipv4")
    red = "tx"
    for k in kinds:
        red = (f"regexp_replace({red}, '{P[k]}', "
               f"'[{k.upper()}]', 'g')")
    counts = ",\n                   ".join(
        f"CAST(len(regexp_extract_all(tx, '{P[k]}')) AS BIGINT) "
        f"AS n_{k}" for k in kinds)
    return f"""
            WITH t AS (
                SELECT doc_id,
                       text || ' contact user' ||
                       CAST(doc_id AS VARCHAR) ||
                       '@example.com tel 555-867-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                       ' ssn 123-45-6789 ip 10.0.0.' ||
                       CAST(doc_id % 256 AS VARCHAR) AS tx
                FROM documents
            )
            SELECT doc_id,
                   {red} AS redacted,
                   {counts}
            FROM t
        """


def _curation_pipeline_oracle() -> str:
    """DuckDB replay of q_curation_pipeline, each stage the same SQL
    already proven by the single-op oracles: text-partition min-id
    dedup (== the engine's sha2 content grouping), the PII_PATTERNS
    replace chain, the exact-integer-sum classifier (bias 0), the
    rounded-linear >= 0 gate, and the md5 hash split with
    exact-binary boundaries."""
    from featuretools_spark.ops.scrub import PII_PATTERNS as P

    red = "text"
    for k in ("email", "ssn", "phone", "ipv4"):
        red = f"regexp_replace({red}, '{P[k]}', '[{k.upper()}]', 'g')"
    return f"""
            WITH canon AS (
                SELECT doc_id, text FROM (
                    -- coalesce mirrors the engine's concat_ws hash
                    -- input, which folds NULL text to ''
                    SELECT doc_id, text,
                           row_number() OVER (PARTITION BY coalesce(text, '')
                                              ORDER BY doc_id) AS rn
                    FROM documents) WHERE rn = 1
            ), red AS (
                SELECT doc_id, {red} AS rx FROM canon
            ), toks AS (
                SELECT doc_id,
                       CASE WHEN rx IS NULL THEN NULL
                            WHEN trim(rx) = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split_regex(lower(trim(rx)),
                                                    '\\s+') END AS tk
                FROM red
            ), g AS (
                SELECT doc_id,
                       CASE WHEN tk IS NULL THEN NULL
                            ELSE list_concat(tk, list_transform(
                                range(1, greatest(len(tk) - 1, 0) + 1),
                                i -> tk[i] || ' ' || tk[i + 1]))
                       END AS grams
                FROM toks
            ), s AS (
                SELECT doc_id, len(grams) AS ng,
                       CASE WHEN grams IS NULL THEN NULL
                            WHEN len(grams) > 0 THEN
                           COALESCE(list_sum(list_transform(grams,
                               x -> ('0x' || substr(md5(x), 1, 8))::BIGINT
                                    / 4294967296.0 - 0.5)), 0.0)
                           / len(grams)
                       ELSE 0.0 END AS lin
                FROM g
            ), kept AS (
                SELECT * FROM s
                WHERE {_R('lin')} >= 0.0
            )
            SELECT doc_id,
                   CAST(ng AS BIGINT) AS n_grams,
                   {_R('lin')} AS linear_score,
                   {_R('1.0/(1.0 + exp(-lin))')} AS quality_prob,
                   CASE WHEN u < 0.75 THEN 'train'
                        WHEN u < 0.875 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT *,
                         ('0x' || substr(md5(doc_id::VARCHAR || '|pipe'),
                                         1, 8))::BIGINT
                         / 4294967296.0 AS u
                  FROM kept)
        """


def _simhash_md5_oracle(max_hamming: int = 10, k: int = 7,
                        threshold: float = 0.5) -> str:
    """DuckDB reproduction of simhash_near_duplicates(hash_fn='md5'):
    identical token bits (md5 hex halves), 64 majority votes, the same
    pigeonhole chunk layout (64 bits split into max_hamming+1 chunks,
    wider chunks first — ops/dedup.py simhash_near_duplicates), exact
    hamming <= bound, exact k-gram Jaccard re-score >= threshold. The
    signature lives as two 32-bit halves (sig_hi = md5 hex 1-8 =
    engine bits 32..63, sig_lo = hex 9-16 = bits 0..31) so every
    shift/mask stays in non-negative BIGINT range; hamming is the sum
    of the halves' xor bit_counts."""
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    starts = [sum(widths[:i]) for i in range(n_chunks)]

    def votes(col):
        return " + ".join(
            f"(CASE WHEN sum(CASE WHEN ({col} >> {i}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(32))

    chunk_rows = []
    for ci, (s, w) in enumerate(zip(starts, widths)):
        mask = (1 << w) - 1
        if s + w <= 32:
            expr = f"(sig_lo >> {s}) & {mask}"
        elif s >= 32:
            expr = f"(sig_hi >> {s - 32}) & {mask}"
        else:  # chunk straddles the 32-bit half boundary
            hi_bits = (1 << (s + w - 32)) - 1
            expr = (f"((sig_lo >> {s}) | ((sig_hi & {hi_bits}) "
                    f"<< {32 - s})) & {mask}")
        chunk_rows.append(
            f"SELECT doc_id, {ci} AS ci, {expr} AS cv FROM sig")
    chunks = "\n                UNION ALL ".join(chunk_rows)

    return f"""
            -- simhash_near_duplicates(hash_fn='md5') reproduced
            -- end-to-end: md5 token bits -> 64 majority votes ->
            -- pigeonhole chunk blocking -> exact hamming <=
            -- {max_hamming} -> exact {k}-gram Jaccard >= {threshold}
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(
                           lower(trim(text)), '\\s+')) AS tok
                FROM documents
            ), h AS (
                SELECT doc_id,
                       ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
                       ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
                FROM toks
            ), sig AS (
                SELECT doc_id,
                       {votes('hi')} AS sig_hi,
                       {votes('lo')} AS sig_lo
                FROM h GROUP BY doc_id
            ), chunks AS (
                {chunks}
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM chunks a JOIN chunks b
                  ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
            ), ham AS (
                SELECT c.id_a, c.id_b FROM cand c
                JOIN sig sa ON sa.doc_id = c.id_a
                JOIN sig sb ON sb.doc_id = c.id_b
                WHERE bit_count(xor(sa.sig_hi, sb.sig_hi))
                    + bit_count(xor(sa.sig_lo, sb.sig_lo))
                    <= {max_hamming}
            ), sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(length(lower(text))
                                             - {k - 1}, 1) + 1),
                           i -> substring(lower(text), i::INT, {k})))
                           AS s
                FROM documents
            ), p AS (
                SELECT hm.id_a, hm.id_b,
                       len(list_intersect(a.s, b.s))::DOUBLE
                       / (len(a.s) + len(b.s)
                          - len(list_intersect(a.s, b.s))) AS j
                FROM ham hm
                JOIN sh a ON a.doc_id = hm.id_a
                JOIN sh b ON b.doc_id = hm.id_b
            )
            SELECT id_a, id_b, {_R('j')} AS jaccard
            FROM p WHERE j >= {threshold}
        """


def _Re(e: str) -> str:
    """Epsilon-shifted round4 for order-dependent double sums."""
    return f"floor(({e})*10000 + 0.5 + 1e-6)/10000"


def _winnow_cte(k: int, w: int, text_expr: str) -> str:
    """CTEs t -> gh -> an mirroring ops/dedup._winnow_anchors over
    documents: per doc the dense md5 k-gram hash list `h` and the
    winnowed 0-based anchor-position list `ap` (leftmost-min per
    w-window — list_position is first-occurrence, matching Spark's
    array_min over (hash, pos) structs)."""
    win = f"least({w}, len(h))"
    sl = f"h[s + 1 : s + {win}]"
    return f"""
            t AS (SELECT doc_id, {text_expr} AS tx FROM documents),
            gh AS (
                SELECT doc_id, tx, list_transform(
                    range(0, length(tx) - {k} + 1),
                    i -> md5(substring(tx, 1 + i, {k}))) AS h
                FROM t WHERE length(tx) >= {k}
            ), an AS (
                SELECT doc_id, tx, h, list_distinct(list_transform(
                    range(0, len(h) - {win} + 1),
                    s -> s + list_position({sl}, list_min({sl})) - 1
                )) AS ap
                FROM gh
            )"""


def oracle_sql() -> dict[str, str]:
    return {
        "agg_basic": f"""
            SELECT u.user_id,
                   count(e.event_id) AS cnt,
                   {_R('coalesce(sum(e.value), 0)/100.0')} AS sum_v,
                   {_R('avg(e.value)/100.0')} AS mean_v,
                   {_R('min(e.value)/100.0')} AS min_v,
                   {_R('max(e.value)/100.0')} AS max_v,
                   {_R('stddev_pop(e.value)/100.0')} AS std_v,
                   {_R('var_pop(e.value)/10000.0')} AS var_v,
                   {_R('median(e.value)/100.0')} AS med_v
            FROM {_U} u
            LEFT JOIN {_EC} e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "agg_time": f"""
            SELECT u.user_id,
                   {_R(f'(epoch_us({_EV}) - epoch_us(max(e.ts))) / 1e6')} AS tsl,
                   {_R(f'(epoch_us({_EV}) - epoch_us(min(e.ts))) / 1e6')} AS tsf,
                   {_R('CASE WHEN count(e.ts) > 1 THEN (epoch_us(max(e.ts)) - epoch_us(min(e.ts))) / 1e6 / (count(e.ts) - 1) END')} AS atb,
                   {_R('(epoch_us(max(e.ts)) - epoch_us(min(e.ts))) / 1e6')} AS fltd
            FROM {_U} u
            LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "agg_distinct": f"""
            WITH f AS (SELECT * FROM events WHERE ts <= {_EV}),
            m AS (
                SELECT user_id, event_type, count(*) AS c
                FROM f GROUP BY user_id, event_type
            ),
            md AS (
                SELECT user_id, event_type AS mode_et,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY c DESC, event_type ASC) AS rn
                FROM m
            ),
            ent AS (
                SELECT user_id,
                       ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
                FROM m GROUP BY user_id
            )
            SELECT u.user_id,
                   count(DISTINCT e.event_type) AS n_uniq,
                   {_R('count(DISTINCT e.event_type) * 1.0 / count(e.event_type)')} AS pct_uniq,
                   {_R('count(e.event_type) * 1.0 / count(DISTINCT e.event_type)')} AS avg_per_uniq,
                   {_R('any_value(ent.h)')} AS ent,
                   any_value(md.mode_et) AS mode_et
            FROM {_U} u
            LEFT JOIN f e ON e.user_id = u.user_id
            LEFT JOIN md ON md.user_id = u.user_id AND md.rn = 1
            LEFT JOIN ent ON ent.user_id = u.user_id
            GROUP BY u.user_id
        """,
        "where_clause": f"""
            SELECT u.user_id,
                   {_R("coalesce(sum(CASE WHEN e.event_type = 'click' THEN e.value END), 0)/100.0")} AS sum_click,
                   count(CASE WHEN e.event_type = 'click' THEN 1 END)
                       AS cnt_click,
                   {_R("avg(CASE WHEN e.event_type = 'click' THEN e.value END)/100.0")} AS mean_click
            FROM {_U} u
            LEFT JOIN {_EC} e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "training_window": f"""
            SELECT u.user_id,
                   count(e.event_id) AS cnt_5d,
                   {_R('coalesce(sum(e.value), 0)/100.0')} AS sum_5d
            FROM {_U} u
            LEFT JOIN {_EC} e ON e.user_id = u.user_id
                AND e.ts <= {_EV}
                AND e.ts > {_EV} - INTERVAL 5 DAY
            GROUP BY u.user_id
        """,
        "per_row_cutoffs": f"""
            WITH cuts AS (
                SELECT user_id, t FROM {_U},
                (VALUES (TIMESTAMP '2024-01-10'),
                        (TIMESTAMP '2024-01-20')) c(t)
            )
            SELECT cu.user_id,
                   epoch_us(cu.t) AS cutoff_us,
                   count(e.event_id) AS cnt,
                   {_R('coalesce(sum(e.value), 0)/100.0')} AS sum_v,
                   {_R('max(e.value)/100.0')} AS max_v
            FROM cuts cu
            LEFT JOIN {_EC} e ON e.user_id = cu.user_id AND e.ts <= cu.t
            GROUP BY cu.user_id, cu.t
        """,
        "trend": f"""
            -- reference calculate_trend: dropna pairs, NaN for n<=2,
            -- 0 when all x equal, x unit from the first timestamp
            WITH e2 AS (
                SELECT user_id, epoch_us(ts)/1e6 AS xs, value
                FROM {_EC} e WHERE ts <= {_EV} AND value IS NOT NULL
            ),
            g AS (
                SELECT user_id, count(*) AS n,
                       covar_pop(xs, value) AS cov, var_pop(xs) AS var,
                       CAST(floor(min(xs)) AS BIGINT) AS f
                FROM e2 GROUP BY 1
            )
            SELECT u.user_id,
                   {_R('''CASE WHEN g.n <= 2 THEN NULL
                          WHEN g.var = 0 THEN 0.0
                          ELSE g.cov / g.var *
                            (CASE WHEN g.f % 86400 = 0 THEN 86400
                                  WHEN g.f % 3600 = 0 THEN 3600
                                  WHEN g.f % 60 = 0 THEN 60
                                  ELSE 1 END)
                          END * 864.0''')} AS trend_v
            FROM {_U} u
            LEFT JOIN g ON g.user_id = u.user_id
            GROUP BY u.user_id, g.n, g.cov, g.var, g.f
        """,
        "first_last": f"""
            SELECT u.user_id,
                   {_R('arg_min(e.value, e.ts)/100.0')} AS first_v,
                   {_R('arg_max(e.value, e.ts)/100.0')} AS last_v
            FROM {_U} u
            LEFT JOIN {_EC} e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "multihop": f"""
            WITH lc AS (
                SELECT * REPLACE (CAST(floor(l_extendedprice*100 + 0.5)
                                  AS BIGINT) AS l_extendedprice)
                FROM lineitem
            )
            SELECT c.c_custkey,
                   count(l.l_orderkey) AS n_li,
                   {_R('coalesce(sum(l.l_extendedprice), 0)/100.0')} AS sum_price,
                   {_R('avg(l.l_extendedprice)/100.0')} AS mean_price
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                AND o.o_orderdate <= {_TP}
            LEFT JOIN lc l ON l.l_orderkey = o.o_orderkey
                AND l.l_shipdate <= {_TP}
            GROUP BY c.c_custkey
        """,
        "direct": f"""
            -- point-in-time: an orders row dated after the cutoff is
            -- filtered by _handle_time, so its direct values are NULL
            SELECT o.o_orderkey,
                   CASE WHEN o.o_orderdate <= {_TP} THEN
                     {_R('CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT)/100.0')}
                   END AS cust_bal,
                   CASE WHEN o.o_orderdate <= {_TP} THEN c.c_mktsegment
                   END AS cust_seg
            FROM orders o
            LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "sessionize": f"""
            WITH ec AS (SELECT * FROM {_EC}),
            o AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1e6
                               > 1800 THEN 1 ELSE 0 END AS new_s
                FROM ec
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts, value,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM o
            ), per_sess AS (
                SELECT user_id, sid,
                       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6 AS dur,
                       count(*) AS n_ev, sum(value) AS sv
                FROM s GROUP BY user_id, sid
            )
            SELECT user_id,
                   count(*) AS n_sessions,
                   {_R('avg(dur)')} AS avg_dur,
                   {_R('max(sv)/100.0')} AS max_sess_value,
                   max(n_ev) AS max_sess_events
            FROM per_sess GROUP BY user_id
        """,
        "window_transforms": f"""
            WITH ec AS (SELECT * FROM {_EC})
            SELECT event_id,
                   {_R('(lag(value, 1) OVER w)/100.0')} AS lag_v,
                   {_R('(value - lag(value, 1) OVER w)/100.0')} AS diff_v,
                   {_R('(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))/100.0')} AS cum_v,
                   {_R('(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))/100.0')} AS roll3_v
            FROM ec
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "dfs_depth1": f"""
            SELECT u.user_id,
                   count(e.event_id) AS cnt,
                   {_R('coalesce(sum(e.value), 0)/100.0')} AS sum_v,
                   {_R('avg(e.value)/100.0')} AS mean_v,
                   {_R('stddev_pop(e.value)/100.0')} AS std_v,
                   {_R('max(e.value)/100.0')} AS max_v,
                   {_R('min(e.value)/100.0')} AS min_v,
                   count(DISTINCT e.event_type) AS nu_et
            FROM {_U} u
            LEFT JOIN {_EC} e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "dfs_depth3": f"""
            -- depth-3 DFS: per-order lineitem aggs (sum default 0),
            -- re-aggregated per customer (sums/counts default 0,
            -- means stay null), re-aggregated per nation (outer
            -- means skip nulls, outer sums coalesce to 0)
            WITH o AS (
                SELECT o_orderkey, o_custkey,
                       CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS tp
                FROM orders WHERE o_orderdate <= {_TP}
            ),
            l AS (
                SELECT l_orderkey, l_quantity
                FROM lineitem WHERE l_shipdate <= {_TP}
            ),
            lo AS (
                SELECT o.o_orderkey, o.o_custkey, o.tp,
                       COALESCE(SUM(l.l_quantity), 0) AS s_qty,
                       AVG(l.l_quantity) AS m_qty,
                       COUNT(l.l_orderkey) AS c_li
                FROM o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
                GROUP BY 1, 2, 3
            ),
            co AS (
                SELECT o_custkey,
                       CAST(SUM(tp) AS BIGINT) AS s_tp,
                       CAST(COUNT(*) AS BIGINT) AS c_o,
                       AVG(s_qty) AS m_o_sqty,
                       AVG(m_qty) AS m_o_mqty,
                       AVG(c_li) AS m_o_cli,
                       SUM(s_qty) AS s_qty_c
                FROM lo GROUP BY 1
            ),
            cl AS (
                SELECT o.o_custkey,
                       CAST(SUM(o.tp) AS BIGINT) AS s_lo_tp,
                       AVG(o.tp) AS m_lo_tp
                FROM l JOIN o ON l.l_orderkey = o.o_orderkey
                GROUP BY 1
            ),
            cu AS (
                SELECT c.c_custkey, c.c_nationkey,
                       CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT) AS cb,
                       COALESCE(co.s_tp, 0) AS s_tp,
                       COALESCE(co.c_o, 0) AS c_o,
                       co.m_o_sqty, co.m_o_mqty, co.m_o_cli,
                       COALESCE(co.s_qty_c, 0) AS s_qty_c,
                       COALESCE(cl.s_lo_tp, 0) AS s_lo_tp,
                       cl.m_lo_tp
                FROM customer c
                LEFT JOIN co ON co.o_custkey = c.c_custkey
                LEFT JOIN cl ON cl.o_custkey = c.c_custkey
            )
            SELECT n.n_nationkey,
                   n.n_regionkey AS reg,
                   {_R('AVG(cu.cb)')} AS m_cb,
                   CAST(COUNT(cu.c_custkey) AS BIGINT) AS c_c,
                   COALESCE(CAST(SUM(cu.s_tp) AS BIGINT), 0) AS s_tp,
                   {_R('COALESCE(SUM(cu.s_qty_c), 0)')} AS s_qty,
                   {_R('AVG(cu.s_tp)')} AS m_c_stp,
                   {_R('AVG(cu.c_o)')} AS m_c_co,
                   {_Re('COALESCE(SUM(cu.m_o_sqty), 0)')} AS s_c_mosq,
                   {_Re('AVG(cu.m_o_mqty)')} AS m_c_momq,
                   {_Re('AVG(cu.m_o_cli)')} AS m_c_mocl,
                   {_R('AVG(cu.s_lo_tp)')} AS m_c_slotp,
                   {_Re('COALESCE(SUM(cu.m_lo_tp), 0)')} AS s_c_mlotp
            FROM nation n LEFT JOIN cu ON cu.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        """,
        "dfs_depth2": f"""
            -- depth-2 DFS walk: every frame PIT-filtered at the cutoff
            -- (orders AND the orders hop under lineitem), inner
            -- aggregates at the orders grain with engine defaults
            -- (count/sum -> 0), then re-aggregated per customer
            WITH o AS (
                SELECT o_orderkey, o_custkey,
                       CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS tp
                FROM orders WHERE o_orderdate <= {_TP}
            ),
            l AS (
                SELECT l_orderkey, l_quantity,
                       CAST(floor(l_discount*100 + 0.5) AS BIGINT)
                           AS l_discount,
                       CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS ext
                FROM lineitem WHERE l_shipdate <= {_TP}
            ),
            lo AS (
                SELECT o.o_orderkey, o.o_custkey, o.tp,
                       COALESCE(SUM(l.l_quantity), 0) AS s_qty,
                       COALESCE(CAST(SUM(l.ext) AS BIGINT), 0) AS s_ext,
                       COALESCE(SUM(l.l_discount), 0) AS s_disc,
                       AVG(l.l_quantity) AS m_qty,
                       AVG(l.ext) AS m_ext,
                       AVG(l.l_discount) AS m_disc,
                       COUNT(l.l_orderkey) AS c_li
                FROM o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
                GROUP BY 1, 2, 3
            ),
            co AS (
                SELECT o_custkey,
                       CAST(SUM(tp) AS BIGINT) AS s_tp,
                       AVG(tp) AS m_tp,
                       CAST(COUNT(*) AS BIGINT) AS c_o,
                       SUM(m_qty) AS s_o_mqty,
                       SUM(m_ext) AS s_o_mext,
                       SUM(m_disc) AS s_o_mdisc,
                       AVG(s_qty) AS m_o_sqty,
                       AVG(s_ext) AS m_o_sext,
                       AVG(s_disc) AS m_o_sdisc,
                       AVG(m_qty) AS m_o_mqty,
                       AVG(m_ext) AS m_o_mext,
                       AVG(m_disc) AS m_o_mdisc,
                       AVG(c_li) AS m_o_cli
                FROM lo GROUP BY 1
            ),
            cl AS (
                SELECT o.o_custkey,
                       SUM(l.l_quantity) AS s_qty,
                       CAST(SUM(l.ext) AS BIGINT) AS s_ext,
                       SUM(l.l_discount) AS s_disc,
                       AVG(l.l_quantity) AS m_qty,
                       AVG(l.ext) AS m_ext,
                       AVG(l.l_discount) AS m_disc,
                       CAST(COUNT(*) AS BIGINT) AS c_l,
                       CAST(SUM(o.tp) AS BIGINT) AS s_lo_tp,
                       AVG(o.tp) AS m_lo_tp
                FROM l JOIN o ON l.l_orderkey = o.o_orderkey
                GROUP BY 1
            )
            SELECT c.c_custkey,
                   CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT) AS cb,
                   c.c_mktsegment AS seg,
                   COALESCE(co.s_tp, 0) AS s_tp,
                   {_R('co.m_tp')} AS m_tp,
                   COALESCE(co.c_o, 0) AS c_o,
                   {_R('COALESCE(cl.s_qty, 0)')} AS s_qty,
                   COALESCE(cl.s_ext, 0) AS s_ext,
                   {_R('COALESCE(cl.s_disc, 0)')} AS s_disc,
                   {_R('cl.m_qty')} AS m_qty,
                   {_R('cl.m_ext')} AS m_ext,
                   {_R('cl.m_disc')} AS m_disc,
                   COALESCE(cl.c_l, 0) AS c_l,
                   {_Re('COALESCE(co.s_o_mqty, 0)')} AS s_o_mqty,
                   {_Re('COALESCE(co.s_o_mext, 0)')} AS s_o_mext,
                   {_Re('COALESCE(co.s_o_mdisc, 0)')} AS s_o_mdisc,
                   {_R('co.m_o_sqty')} AS m_o_sqty,
                   {_R('co.m_o_sext')} AS m_o_sext,
                   {_R('co.m_o_sdisc')} AS m_o_sdisc,
                   {_Re('co.m_o_mqty')} AS m_o_mqty,
                   {_Re('co.m_o_mext')} AS m_o_mext,
                   {_Re('co.m_o_mdisc')} AS m_o_mdisc,
                   {_R('co.m_o_cli')} AS m_o_cli,
                   COALESCE(cl.s_lo_tp, 0) AS s_lo_tp,
                   {_R('cl.m_lo_tp')} AS m_lo_tp
            FROM customer c
            LEFT JOIN co ON co.o_custkey = c.c_custkey
            LEFT JOIN cl ON cl.o_custkey = c.c_custkey
        """,
        "use_previous_obs": f"""
            WITH r AS (
                SELECT user_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC) AS rn
                FROM {_EC} e WHERE ts <= {_EV}
            )
            SELECT u.user_id,
                   {_R('avg(r.value)/100.0')} AS mean_3o,
                   {_R('coalesce(sum(r.value), 0)/100.0')} AS sum_3o
            FROM {_U} u
            LEFT JOIN r ON r.user_id = u.user_id AND r.rn <= 3
            GROUP BY u.user_id
        """,
        "exclude_cutoff": f"""
            WITH cuts AS (
                SELECT user_id, max(ts) AS t FROM events GROUP BY user_id
            )
            SELECT c.user_id,
                   epoch_us(c.t) AS cutoff_us,
                   count(e.event_id) AS cnt_excl,
                   {_R('coalesce(sum(e.value), 0)/100.0')} AS sum_excl
            FROM cuts c
            LEFT JOIN {_EC} e ON e.user_id = c.user_id AND e.ts < c.t
            GROUP BY c.user_id, c.t
        """,
        "engine_transforms": f"""
            WITH ec AS (SELECT * FROM {_EC})
            SELECT event_id,
                   {_R('(lag(value) OVER (ORDER BY ts, event_id))/100.0')} AS lag_v,
                   {_R('(sum(value) OVER (PARTITION BY event_type ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))/100.0')} AS cum_by_type
            FROM ec
        """,
        "ewm_by_user": f"""
            -- pandas ewm(adjust=True, com=0.5): weight (1-a)^(n-i)
            -- with a = 1/(1+com) -> 1-a = 1/3; the explicit weighted
            -- sum over the running prefix equals pandas' recurrence
            WITH ec AS (SELECT * FROM {_EC}),
            p AS (
                SELECT event_id,
                       row_number() OVER w AS rn,
                       list(value::DOUBLE) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS vals
                FROM ec
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id,
                   floor((list_sum(list_transform(vals,
                              (x,i) -> x * power(1.0/3, rn - i)))
                          / list_sum(list_transform(vals,
                              -- pandas ignore_na=False: NULL rows
                              -- decay the weights but add no weight
                              (x,i) -> CASE WHEN x IS NULL THEN NULL
                                       ELSE power(1.0/3, rn - i)
                                       END)))/100.0
                         * 1e4 + 0.5 + 1e-6) / 1e4 AS ewm_v
            FROM p
        """,
        "lti": """
            WITH oli AS (
                SELECT o.o_custkey,
                       greatest(o.o_orderdate,
                                coalesce(max(l.l_shipdate), o.o_orderdate))
                           AS olti
                FROM orders o
                LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
            )
            SELECT c.c_custkey, epoch_us(max(oli.olti)) AS lti_us
            FROM customer c
            LEFT JOIN oli ON oli.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        """,
        "n_most_common": f"""
            WITH m AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events WHERE ts <= {_EV} GROUP BY user_id, event_type
            ), r AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY c DESC, event_type ASC) AS rn
                FROM m
            )
            SELECT u.user_id,
                   coalesce(string_agg(r.event_type, ',' ORDER BY r.rn), '')
                       AS top2
            FROM {_U} u
            LEFT JOIN r ON r.user_id = u.user_id AND r.rn <= 2
            GROUP BY u.user_id
        """,
        "dedup_exact": """
            SELECT doc_id,
                   count(*) OVER (PARTITION BY text) AS dup_count,
                   CASE WHEN count(*) OVER (PARTITION BY text) > 1
                        AND doc_id != min(doc_id) OVER (PARTITION BY text)
                        THEN 1 ELSE 0 END AS is_dup
            FROM documents
        """,
        "text_quality": f"""
            WITH w AS (
                SELECT doc_id, text,
                       length(text) AS n_chars_calc,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+'))
                       END AS n_words,
                       string_split_regex(lower(trim(text)), '\\s+') AS ww
                FROM documents
            )
            SELECT doc_id, n_chars_calc, n_words,
                   {_R(_MWL_EXPR)} AS mean_word_len,
                   {_R(_PUNCT_EXPR)} AS punct_ratio,
                   {_R(_STOP_EXPR)} AS stopword_ratio
            FROM w
        """,
        "token_count": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END AS ws_tokens,
                   len(regexp_extract_all(text, {_BPE_SQL})) AS bpe_tokens
            FROM documents
        """,
        # real-BPE witness: WITNESS_BPE_MERGES applied as a
        # rank-ordered replace() chain (merge outputs are fresh
        # sentinel chars consumed only by later merges, so exhaustive
        # left-to-right application in rank order == the engine's
        # lowest-rank-present priority loop; replace() is LTR
        # non-overlapping in both engines). Token count = codepoints
        # left after stripping whitespace, since every unmerged char
        # and every sentinel is exactly one symbol.
        "token_count_bpe": """
            SELECT doc_id,
                   CAST(length(regexp_replace(
                     replace(replace(replace(replace(
                     replace(replace(replace(replace(
                       lower(text),
                       'th', chr(1)), chr(1) || 'e', chr(2)),
                       'in', chr(3)), 'er', chr(4)),
                       'an', chr(5)), 'on', chr(6)),
                       're', chr(7)), 'at', chr(8)),
                     '\\s', '', 'g')) AS BIGINT) AS bpe_tokens
            FROM documents
        """,
        # concat-and-slice packing: one window cumsum (fine
        # single-node at oracle scale; the ENGINE does the segmented
        # scan) + generate_series per spanned chunk. CAST the window
        # sum to BIGINT (DuckDB sums to HUGEINT) and every output to
        # BIGINT for the typed-hash compare.
        "pack_chunks": """
            WITH s AS (
                SELECT doc_id, n_chars AS n,
                       CAST(sum(n_chars) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_chars
                            AS BIGINT) AS st
                FROM documents
            )
            SELECT doc_id,
                   CAST(c AS BIGINT) AS chunk_id,
                   CAST(greatest(0, c * 2048 - st) AS BIGINT) AS tok_from,
                   CAST(least(n, (c + 1) * 2048 - st) AS BIGINT) AS tok_to,
                   CAST(st + greatest(0, c * 2048 - st) - c * 2048
                        AS BIGINT) AS chunk_pos
            FROM s, unnest(generate_series(st // 2048,
                                           (st + n - 1) // 2048)) AS t(c)
            WHERE n > 0
        """,
        # hash split: u = md5-hex-prefix/2^32 (exact double) against
        # exact-binary boundaries 0.75/0.875 — no cross-engine
        # float-literal ambiguity possible.
        "hash_split": """
            SELECT doc_id,
                   CASE WHEN u < 0.75 THEN 'train'
                        WHEN u < 0.875 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5(doc_id::VARCHAR || '|r7'),
                                         1, 8))::BIGINT
                         / 4294967296.0 AS u
                  FROM documents)
        """,
        # fastText-style witness classifier: same grams (lowercased
        # whitespace unigrams + space-joined bigrams), same injected
        # md5 weights. Every per-gram weight is integer/2^32 (exact
        # in double) and per-doc sums stay far below 2^53, so the
        # gram sum is exact in ANY order; the mean divides identical
        # operands. Only sigmoid's exp() differs at libm-ulp level —
        # both sides quantize half-up to 4 decimals.
        "quality_classifier": f"""
            WITH toks AS (
                SELECT doc_id, text,
                       CASE WHEN text IS NULL THEN NULL
                            WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE string_split_regex(lower(trim(text)),
                                                    '\\s+') END AS tk
                FROM documents
            ), g AS (
                SELECT doc_id, text,
                       CASE WHEN tk IS NULL THEN NULL
                            ELSE list_concat(tk, list_transform(
                                range(1, greatest(len(tk) - 1, 0) + 1),
                                i -> tk[i] || ' ' || tk[i + 1]))
                       END AS grams
                FROM toks
            ), s AS (
                SELECT doc_id, text, len(grams) AS ng,
                       0.25 + CASE WHEN len(grams) > 0 THEN
                           COALESCE(list_sum(list_transform(grams,
                               x -> ('0x' || substr(md5(x), 1, 8))::BIGINT
                                    / 4294967296.0 - 0.5)), 0.0)
                           / len(grams)
                       ELSE 0.0 END AS lin
                FROM g
            )
            SELECT doc_id,
                   CAST(CASE WHEN text IS NULL THEN NULL
                             ELSE ng END AS BIGINT) AS n_grams,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE {_R('lin')} END AS linear_score,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE {_R('1.0/(1.0 + exp(-lin))')}
                   END AS quality_prob
            FROM s
        """,
        "lang_id": """
            WITH w AS (
                SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\\s+') AS ww
                FROM documents
            ), s AS (
                SELECT doc_id,
                       len(list_filter(ww, x -> x IN ('der','die','und','das','ist','nicht','ein','mit','auf','sich'))) AS s_de,
                       len(list_filter(ww, x -> x IN ('the','and','of','to','in','is','that','for','with','was'))) AS s_en,
                       len(list_filter(ww, x -> x IN ('el','la','los','que','de','es','en','por','con','una'))) AS s_es,
                       len(list_filter(ww, x -> x IN ('le','la','les','et','de','est','que','pour','dans','une'))) AS s_fr
                FROM w
            )
            SELECT doc_id,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                        WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                        WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                        WHEN s_es >= s_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM s
        """,
        "ann_brute_topk": f"""
            WITH q AS (
                SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 5
            ), c AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id >= 5
            ), s AS (
                SELECT q.qid AS query_id, c.vec_id,
                       list_dot_product(c.v, q.qv)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS score
                FROM c, q
            ), r AS (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id ASC)
                           AS rank
                FROM s
            )
            SELECT query_id, vec_id, {_R('score')} AS score, rank
            FROM r WHERE rank <= 5
        """,
        "lsh_topk": f"""
            -- full random-hyperplane LSH pipeline reproduced in SQL
            -- (hash_fn="md5" witness mode): plane component for
            -- (table t, plane p, dim d) = ((first-8-hex-digits of
            -- md5('{{42+7919t}},{{p}},{{d}}') as int) % 2001 - 1000)/1000;
            -- signature = 12 sign bits; three 4-bit bands per table;
            -- candidates = corpus rows sharing any (band, val) with a
            -- query; exact cosine re-rank, top 5
            WITH emb AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ), sigs AS (
                SELECT vec_id, t.t,
                       CAST(list_sum(list_transform(range(0, 12), p ->
                           CASE WHEN list_sum(list_transform(v, (x, i) ->
                               x * (((('0x' || substr(md5(
                                     CAST(42 + 7919 * t.t AS VARCHAR)
                                     || ',' || CAST(p AS VARCHAR)
                                     || ',' || CAST(i - 1 AS VARCHAR)
                                   ), 1, 8))::BIGINT) % 2001 - 1000)
                                   / 1000.0)
                             )) > 0
                           THEN CAST(power(2, p) AS BIGINT)
                           ELSE 0 END)) AS BIGINT) AS sig
                FROM emb, (SELECT unnest(range(0, 8)) AS t) t
            ), banded AS (
                SELECT vec_id, t * 3 + b.i AS band,
                       (sig >> (4 * b.i)) & 15 AS val
                FROM sigs, (SELECT unnest(range(0, 3)) AS i) b
            ), cand AS (
                SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
                FROM banded q JOIN banded c
                  ON q.band = c.band AND q.val = c.val
                WHERE q.vec_id < 3 AND c.vec_id >= 3
            ), s AS (
                SELECT cand.qid AS query_id, cand.cid AS vec_id,
                       list_dot_product(cv.v, qv.v)
                       / (sqrt(list_dot_product(cv.v, cv.v))
                          * sqrt(list_dot_product(qv.v, qv.v))) AS score
                FROM cand
                JOIN emb cv ON cv.vec_id = cand.cid
                JOIN emb qv ON qv.vec_id = cand.qid
            ), r AS (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id ASC)
                           AS rank
                FROM s
            )
            SELECT query_id, vec_id, {_R('score')} AS score, rank
            FROM r WHERE rank <= 5
        """,
        "ivf_topk": f"""
            -- full IVF pipeline reproduced in SQL: the coarse
            -- quantizer is the deterministic corpus sample
            -- vec_id IN (31, 62, ..., 496) (cid = vec_id/31 - 1),
            -- assignment/probe use the same expansion
            -- d2 = <v,v> - 2<v,c> + <c,c> with ties broken toward
            -- the lower cid, n_probe=4 lists per query, exact
            -- cosine re-rank of candidates
            WITH cent AS (
                SELECT CAST(vec_id // 31 - 1 AS INT) AS cid,
                       CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings
                WHERE vec_id % 31 = 0 AND vec_id BETWEEN 31 AND 496
            ), corpus AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id >= 5
            ), q AS (
                SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 5
            ), ca AS (
                SELECT vec_id, v, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY
                           list_dot_product(v, v)
                           - 2 * list_dot_product(v, cv)
                           + list_dot_product(cv, cv) ASC, cid ASC) AS rn
                FROM corpus, cent
            ), assigned AS (
                SELECT vec_id, v, cid FROM ca WHERE rn = 1
            ), qp AS (
                SELECT qid, qv, cid,
                       row_number() OVER (PARTITION BY qid ORDER BY
                           list_dot_product(qv, qv)
                           - 2 * list_dot_product(qv, cv)
                           + list_dot_product(cv, cv) ASC, cid ASC) AS rn
                FROM q, cent
            ), probes AS (
                SELECT qid, qv, cid FROM qp WHERE rn <= 4
            ), cand AS (
                SELECT p.qid, p.qv, a.vec_id, a.v
                FROM assigned a JOIN probes p ON a.cid = p.cid
            ), s AS (
                SELECT qid AS query_id, vec_id,
                       list_dot_product(v, qv)
                       / (sqrt(list_dot_product(v, v))
                          * sqrt(list_dot_product(qv, qv))) AS score
                FROM cand
            ), r AS (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id ASC)
                           AS rank
                FROM s
            )
            SELECT query_id, vec_id, {_R('score')} AS score, rank
            FROM r WHERE rank <= 5
        """,
        "ewm_global": f"""
            -- pandas ewm(adjust=True, com=0.5) over the GLOBAL
            -- (ts, event_id) ordering: explicit weighted prefix sum
            WITH ec AS (SELECT * FROM {_EC} WHERE event_id < 3000),
            p AS (
                SELECT event_id,
                       row_number() OVER w AS rn,
                       list(value::DOUBLE) OVER (
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS vals
                FROM ec
                WINDOW w AS (ORDER BY ts, event_id)
            )
            SELECT event_id,
                   floor((list_sum(list_transform(vals,
                              (x,i) -> x * power(1.0/3, rn - i)))
                          / list_sum(list_transform(vals,
                              -- pandas ignore_na=False: NULL rows
                              -- decay the weights but add no weight
                              (x,i) -> CASE WHEN x IS NULL THEN NULL
                                       ELSE power(1.0/3, rn - i)
                                       END)))/100.0
                         * 1e4 + 0.5 + 1e-6) / 1e4 AS ewm_v
            FROM p
        """,
        "embedding_dedup": f"""
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ), p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS cos
                FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, {_R('cos')} AS cos
            FROM p WHERE cos >= 0.35
        """,
        "minhash_dedup": f"""
            -- exact-verified near-dup pairs: the witness claim is
            -- that MinHash-LSH candidates at threshold 0.5 contain
            -- every pair with true 5-gram Jaccard >= 0.5 (planted
            -- pairs sit at J >= 0.9; next-highest corpus pair ~0.31)
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(length(lower(text)) - 4, 1) + 1),
                           i -> substring(lower(text), i::INT, 5))) AS s
                FROM documents
            ), p AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       len(list_intersect(a.s, b.s))::DOUBLE
                       / (len(a.s) + len(b.s)
                          - len(list_intersect(a.s, b.s))) AS j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, {_R('j')} AS jaccard
            FROM p WHERE j >= 0.5
        """,
        "simhash_dedup": _simhash_md5_oracle(max_hamming=10, k=7,
                                             threshold=0.5),
        "ngram_jaccard": f"""
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(length(lower(text)) - 4, 1) + 1),
                           i -> substring(lower(text), i::INT, 5))) AS s
                FROM documents
            )
            SELECT a.doc_id,
                   {_R('len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))')} AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
        "approximate": f"""
            WITH cuts AS (
                SELECT user_id, t FROM {_U},
                (VALUES (TIMESTAMP '2024-01-15 06:00:00'),
                        (TIMESTAMP '2024-01-15 18:00:00'),
                        (TIMESTAMP '2024-01-19')) c(t)
            ), binned AS (
                SELECT user_id, t,
                       to_timestamp(floor(epoch_us(t) / 172800000000)
                                    * 172800) AS tb
                FROM cuts
            )
            SELECT b.user_id,
                   epoch_us(b.t) AS cutoff_us,
                   count(e.event_id) AS cnt_approx,
                   {_R('coalesce(sum(e.value), 0)/100.0')} AS sum_approx
            FROM binned b
            LEFT JOIN {_EC} e ON e.user_id = b.user_id AND e.ts <= b.tb
            GROUP BY b.user_id, b.t
        """,
        "output_slice": f"""
            WITH m AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events WHERE ts <= {_EV} GROUP BY user_id, event_type
            ), r AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY c DESC, event_type ASC) AS rn
                FROM m
            )
            SELECT u.user_id,
                   max(CASE WHEN r.rn = 1 THEN r.event_type END) AS top1,
                   max(CASE WHEN r.rn = 2 THEN r.event_type END) AS top2
            FROM {_U} u
            LEFT JOIN r ON r.user_id = u.user_id AND r.rn <= 2
            GROUP BY u.user_id
        """,
        "temporal_cutoffs": f"""
            WITH cuts AS (
                SELECT user_id, t FROM {_U},
                (VALUES (TIMESTAMP '2024-01-08'),
                        (TIMESTAMP '2024-01-15'),
                        (TIMESTAMP '2024-01-22')) c(t)
            )
            SELECT cu.user_id,
                   epoch_us(cu.t) AS cutoff_us,
                   count(e.event_id) AS cnt
            FROM cuts cu
            LEFT JOIN events e ON e.user_id = cu.user_id AND e.ts <= cu.t
            GROUP BY cu.user_id, cu.t
        """,
        "custom_primitive": f"""
            SELECT u.user_id,
                   {_R('coalesce(sum(e.value * e.value), 0)/10000.0')} AS ssq
            FROM {_U} u
            LEFT JOIN {_EC} e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "holistic_wide": f"""
            WITH cu AS (
                SELECT user_id, ct FROM {_U},
                (VALUES (TIMESTAMP '2024-01-10'),
                        (TIMESTAMP '2024-01-20')) c(ct)
            ),
            f AS (
                SELECT cu.user_id, cu.ct, e.event_type, e.value
                FROM cu LEFT JOIN {_EC} e
                  ON e.user_id = cu.user_id AND e.ts <= cu.ct
            ),
            m AS (
                SELECT user_id, ct, event_type, count(*) AS c
                FROM f WHERE event_type IS NOT NULL
                GROUP BY user_id, ct, event_type
            ),
            r AS (
                SELECT user_id, ct, event_type, c,
                       row_number() OVER (PARTITION BY user_id, ct
                                          ORDER BY c DESC, event_type ASC)
                           AS rn
                FROM m
            ),
            agg AS (
                SELECT user_id, ct,
                       max(CASE WHEN rn = 1 THEN event_type END) AS mode_et,
                       ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h,
                       string_agg(CASE WHEN rn <= 2 THEN event_type END,
                                  ',' ORDER BY rn) AS top2
                FROM r GROUP BY user_id, ct
            ),
            fl AS (
                SELECT user_id, ct,
                       CAST(count(*) FILTER (WHERE value > vmean) AS DOUBLE)
                           AS cam,
                       count(*) FILTER (WHERE value = vmax) AS mxc
                FROM (
                    SELECT user_id, ct, value,
                           avg(value) OVER (PARTITION BY user_id, ct)
                               AS vmean,
                           max(value) OVER (PARTITION BY user_id, ct) AS vmax
                    FROM f WHERE value IS NOT NULL
                ) GROUP BY user_id, ct
            )
            SELECT cu.user_id,
                   epoch_us(cu.ct) AS cutoff_us,
                   agg.mode_et AS mode_et,
                   {_R('agg.h')} AS ent,
                   coalesce(agg.top2, '') AS top2,
                   coalesce(fl.cam, 0.0) AS cam,
                   coalesce(fl.mxc, 0) AS mxc
            FROM cu
            LEFT JOIN agg ON agg.user_id = cu.user_id AND agg.ct = cu.ct
            LEFT JOIN fl ON fl.user_id = cu.user_id AND fl.ct = cu.ct
        """,
        "audio_features": """
            SELECT CAST(doc_id AS VARCHAR) AS media_id,
                   CAST(44 + 2 * (2000 + (doc_id % 7) * 500)
                        AS INTEGER) AS n_bytes,
                   CAST(8000 AS INTEGER) AS sample_rate,
                   CAST(2000 + (doc_id % 7) * 500 AS BIGINT) AS n_samples,
                   (2000 + (doc_id % 7) * 500) / 8000.0 AS duration_s
            FROM documents
        """,
        "corr_matrix": f"""
            SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                   {_R('corr(l_quantity, l_extendedprice)')} AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_quantity', 'l_discount',
                   {_R('corr(l_quantity, l_discount)')} FROM lineitem
            UNION ALL
            SELECT 'l_quantity', 'l_tax',
                   {_R('corr(l_quantity, l_tax)')} FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', 'l_discount',
                   {_R('corr(l_extendedprice, l_discount)')} FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', 'l_tax',
                   {_R('corr(l_extendedprice, l_tax)')} FROM lineitem
            UNION ALL
            SELECT 'l_discount', 'l_tax',
                   {_R('corr(l_discount, l_tax)')} FROM lineitem
        """,
        "redact_pii": _redact_pii_oracle(),
        "curation_pipeline": _curation_pipeline_oracle(),
        "cross_dup": f"""
            -- winnowed md5 k-gram cross-doc duplication, mirroring
            -- ops/dedup.cross_doc_duplication(k=20, w=8)
            WITH {_winnow_cte(20, 8, 'lower(text)')}, g AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    ap, p -> h[p + 1]))) AS gram
                FROM an
            ), dfreq AS (
                SELECT gram, count(DISTINCT doc_id) AS dfq
                FROM g GROUP BY gram
            ), pd AS (
                SELECT g.doc_id, count(*) AS n,
                       sum(CASE WHEN dfq >= 2 THEN 1 ELSE 0 END) AS s
                FROM g JOIN dfreq USING (gram) GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(pd.n, 0) AS BIGINT) AS n_spans,
                   {_R('CASE WHEN pd.n > 0 THEN pd.s::DOUBLE / pd.n ELSE 0.0 END')}
                       AS shared_frac
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN pd ON pd.doc_id = d.doc_id
        """,
        "dedup_spans": f"""
            -- exact-substring span removal, mirroring
            -- ops/dedup.trim_duplicated_spans(k=20, w=8, min_df=2):
            -- winnowed anchors -> df>=2 grams -> merged [p, p+20)
            -- intervals (gaps-and-islands) -> substring surgery
            WITH {_winnow_cte(20, 8, 'text')}, g2 AS (
                SELECT doc_id, unnest(ap) AS p,
                       unnest(list_transform(ap, q -> h[q + 1])) AS gram
                FROM an
            ), dupg AS (
                SELECT gram FROM (
                    SELECT gram, count(DISTINCT doc_id) AS c
                    FROM g2 GROUP BY gram
                ) WHERE c >= 2
            ), dpos AS (
                SELECT DISTINCT doc_id, p FROM g2 JOIN dupg USING (gram)
            ), iv AS (
                SELECT doc_id, p AS s, p + 20 AS e,
                       CASE WHEN p > coalesce(max(p + 20) OVER (
                                PARTITION BY doc_id ORDER BY p
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), -1)
                            THEN 1 ELSE 0 END AS brk
                FROM dpos
            ), isl AS (
                SELECT doc_id, s, e,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                                      ROWS UNBOUNDED PRECEDING)
                           AS island
                FROM iv
            ), merged AS (
                SELECT doc_id, island, min(s) AS s, max(e) AS e
                FROM isl GROUP BY doc_id, island
            ), stats AS (
                SELECT doc_id, count(*) AS n_iv, sum(e - s) AS rm,
                       max(e) AS last_e
                FROM merged GROUP BY doc_id
            ), pieces AS (
                SELECT m.doc_id, m.s,
                       substring(t.tx,
                           coalesce(lag(m.e) OVER (
                               PARTITION BY m.doc_id ORDER BY m.s),
                               0) + 1,
                           m.s - coalesce(lag(m.e) OVER (
                               PARTITION BY m.doc_id ORDER BY m.s),
                               0)) AS piece
                FROM merged m JOIN t ON t.doc_id = m.doc_id
            ), heads AS (
                SELECT doc_id, string_agg(piece, '' ORDER BY s) AS head
                FROM pieces GROUP BY doc_id
            ), tr AS (
                SELECT st.doc_id,
                       concat(coalesce(hd.head, ''),
                              substring(t.tx, st.last_e + 1)) AS trimmed
                FROM stats st
                JOIN t ON t.doc_id = st.doc_id
                LEFT JOIN heads hd ON hd.doc_id = st.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(st.n_iv, 0) AS BIGINT) AS n_dup_spans,
                   CAST(coalesce(st.rm, 0) AS BIGINT) AS chars_removed,
                   CAST(length(coalesce(tr.trimmed, d.text)) AS BIGINT)
                       AS trimmed_len,
                   md5(coalesce(tr.trimmed, d.text)) AS trimmed_md5
            FROM documents d
            LEFT JOIN stats st ON st.doc_id = d.doc_id
            LEFT JOIN tr ON tr.doc_id = d.doc_id
        """,
        "repetition": f"""
            -- word-bigram repetition signals, mirroring
            -- ops/textstats.repetition_features(n=2)
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+')
                           AS w
                FROM documents
            ), g AS (
                SELECT doc_id, unnest(list_transform(
                    range(1, greatest(len(w) - 1, 0) + 1),
                    i -> array_to_string(w[i:i+1], ' '))) AS gram
                FROM toks
            ), pg AS (
                SELECT doc_id, gram, count(*) AS c
                FROM g GROUP BY doc_id, gram
            ), a AS (
                SELECT doc_id, sum(c) AS total, max(c) AS top,
                       sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
                FROM pg GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(a.total, 0) AS BIGINT) AS n_grams,
                   {_R('CASE WHEN a.total > 0 THEN a.top::DOUBLE / a.total ELSE 0.0 END')}
                       AS top_ngram_frac,
                   {_R('CASE WHEN a.total > 0 THEN a.dup::DOUBLE / a.total ELSE 0.0 END')}
                       AS dup_ngram_frac
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN a ON a.doc_id = d.doc_id
        """,
        "decontaminate": """
            -- word-5-gram overlap vs the doc_id % 97 == 0 benchmark
            -- slice, mirroring ops/scrub.decontaminate
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+')
                           AS w
                FROM documents
            ), g AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, greatest(len(w) - 4, 0) + 1),
                    i -> array_to_string(w[i:i+4], ' ')))) AS gram
                FROM toks
            ), bg AS (
                SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
            ), m AS (
                SELECT g.doc_id, count(*) AS n
                FROM g JOIN bg USING (gram)
                WHERE g.doc_id % 97 <> 0
                GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(m.n, 0) AS BIGINT) AS n_matched,
                   COALESCE(m.n, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
            LEFT JOIN m ON m.doc_id = d.doc_id
        """,
        "video_features": """
            SELECT CAST(doc_id AS VARCHAR) AS media_id,
                   CAST(16 AS INTEGER) AS width,
                   CAST(8 AS INTEGER) AS height,
                   CAST(2 + doc_id % 4 AS INTEGER) AS n_frames,
                   CAST(5.0 AS DOUBLE) AS fps,
                   (2 + doc_id % 4) / 5.0 AS duration_s
            FROM documents
        """,
        "dedup_clusters": """
            WITH RECURSIVE p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings) a
                JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings) b
                  ON a.vec_id < b.vec_id
                WHERE list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(b.v, b.v))) >= 0.35
            ), e AS (
                SELECT id_a AS src, id_b AS dst FROM p
                UNION SELECT id_b, id_a FROM p
            ), r AS (
                SELECT src AS id, src AS lbl FROM e
                UNION
                SELECT e.dst AS id, r.lbl FROM r JOIN e ON e.src = r.id
            )
            SELECT CAST(id AS BIGINT) AS id,
                   CAST(min(lbl) AS BIGINT) AS cluster_id
            FROM r GROUP BY id
        """,
        "fingerprint": """
            WITH t AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                           AS tx
                FROM documents
            ), g AS (
                SELECT doc_id, tx,
                       list_transform(
                           generate_series(1,
                               greatest(length(tx) - 7, 1)),
                           i -> md5(substr(tx, i, 8))) AS hs
                FROM t
            )
            SELECT doc_id,
                   md5(tx) AS exact_fp,
                   list_aggregate(hs, 'min') AS min_gram_fp,
                   list_aggregate(hs, 'max') AS max_gram_fp
            FROM g
        """,
        "multimodal_features": """
            SELECT CAST(doc_id AS VARCHAR) AS media_id,
                   octet_length(encode(text)) AS n_bytes,
                   md5(text) AS payload_md5
            FROM documents
        """,
        "direct_chain": """
            SELECT c.c_custkey,
                   r.r_name AS region_name,
                   CAST(length(r.r_name) AS BIGINT) AS region_name_len
            FROM customer c
            LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
            LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
        """,
        "ewm_of_agg": f"""
            WITH a AS (
                SELECT c.c_custkey, c.c_nationkey,
                       coalesce(sum(CAST(floor(o.o_totalprice*100 + 0.5)
                                         AS BIGINT)), 0) AS sp
                FROM customer c
                LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                                  AND o.o_orderdate <= {_TP}
                GROUP BY c.c_custkey, c.c_nationkey
            ), p AS (
                SELECT c_custkey, sp,
                       row_number() OVER w AS rn,
                       list(sp::DOUBLE) OVER (
                           PARTITION BY c_nationkey ORDER BY c_custkey
                           ROWS UNBOUNDED PRECEDING) AS vals
                FROM a
                WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
            )
            SELECT c_custkey,
                   sp / 100.0 AS sum_p,
                   floor((list_sum(list_transform(vals,
                              (x,i) -> x * power(1.0/3, rn - i)))
                          / list_sum(list_transform(vals,
                              (x,i) -> CASE WHEN x IS NULL THEN NULL
                                       ELSE power(1.0/3, rn - i)
                                       END)))/100000.0
                         * 1e4 + 0.5 + 1e-6) / 1e4 AS ewm_k
            FROM p
        """,
        "groupby_trans_agg": f"""
            WITH a AS (
                SELECT c.c_custkey, c.c_nationkey,
                       count(o.o_orderkey) AS cnt,
                       coalesce(sum(CAST(floor(o.o_totalprice*100 + 0.5)
                                         AS BIGINT)), 0) AS sp
                FROM customer c
                LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                                  AND o.o_orderdate <= {_TP}
                GROUP BY c.c_custkey, c.c_nationkey
            )
            SELECT c_custkey,
                   cnt,
                   sp / 100.0 AS sum_p,
                   CAST(sum(cnt) OVER (PARTITION BY c_nationkey
                                       ORDER BY c_custkey)
                        AS BIGINT) AS cum_cnt,
                   max(sp) OVER (PARTITION BY c_nationkey
                                 ORDER BY c_custkey) / 100.0 AS cum_max_p
            FROM a
        """,
    }
