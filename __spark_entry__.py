"""Driver contract for the spark-graft builder (PySpark target).

Every query below runs through the featuretools_spark engine
(EntitySet → features → calculate_feature_matrix / sessionize), and
each has an equivalent ANSI-SQL oracle for DuckDB.

Conventions for exact oracle matching:
- doubles are rounded to 4 decimals on BOTH sides
- timestamps in outputs are converted to epoch microseconds (bigint):
  Spark `unix_micros(cast(ts as timestamp))` == DuckDB `epoch_us(ts)`
- every computed column is aliased identically on both sides
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.features import IdentityFeature, AggregationFeature
from featuretools_spark.sessionize import sessionize, session_stats

EV_CUTOFF = dt.datetime(2024, 1, 20)
TPCH_CUTOFF = dt.datetime(1998, 1, 1)


# ----------------------------------------------------------------------
# EntitySet builders
# ----------------------------------------------------------------------
def _es_events(spark: SparkSession, sf_dir: str) -> fts.EntitySet:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = events.select("user_id").distinct()
    es = fts.EntitySet("events_es")
    es.add_dataframe("users", users, index="user_id")
    es.add_dataframe("events", events, index="event_id", time_index="ts")
    es.add_relationship("users", "user_id", "events", "user_id")
    return es


def _es_tpch(spark: SparkSession, sf_dir: str) -> fts.EntitySet:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "_li_id", F.col("l_orderkey") * 10 + F.col("l_linenumber")
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
    """Round to 4 decimals via floor(x*1e4 + 0.5)/1e4 — pure IEEE ops,
    bit-identical in Spark and DuckDB (F.round goes through BigDecimal
    HALF_UP of the decimal string, which disagrees with the oracle on
    exact half-boundaries)."""
    for c in cols:
        x = F.col(c).cast("double")
        df = df.withColumn(
            c, F.floor(x * 10000.0 + F.lit(0.5)).cast("double") / 10000.0
        )
    return df


def _q(name: str):
    """Exact-name column reference (feature names contain dots)."""
    return F.col(f"`{name}`")


def _sel(fm: DataFrame, index_col, renames: dict) -> DataFrame:
    """Select index + renamed feature columns from a feature matrix."""
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
    return _r4(out, ["sum_v", "mean_v", "min_v", "max_v", "std_v", "var_v", "med_v"])


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
    return _r4(out, ["sum_v", "max_v"])


def q_trend(spark, sf_dir):
    es = _es_events(spark, sf_dir)
    v = IdentityFeature(es, "events", "value")
    feats = [AggregationFeature(v, "users", "trend", es=es)]
    fm = fts.calculate_feature_matrix(feats, es, cutoff_time=EV_CUTOFF)
    out = _sel(fm, "user_id", {"TREND(events.value)": "trend_v"})
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
    return _r4(out, ["cust_bal"])


def q_sessionize(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ss = session_stats(events, "user_id", "ts", gap="30 minutes",
                       value_col="value")
    out = ss.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        (F.floor(F.avg("duration_s") * 10000.0 + F.lit(0.5)).cast("double") / 10000.0).alias("avg_dur"),
        (F.floor(F.max("sum_value") * 10000.0 + F.lit(0.5)).cast("double") / 10000.0).alias("max_sess_value"),
        F.max("n_events").alias("max_sess_events"),
    )
    return out


def q_window_transforms(spark, sf_dir):
    """event-grain window transforms: lag / diff / cum_sum / rolling mean
    partitioned per user in time order."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    cum = w.rowsBetween(W.unboundedPreceding, 0)
    roll3 = w.rowsBetween(-2, 0)
    out = events.select(
        "event_id",
        F.lag("value", 1).over(w).alias("lag_v"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("diff_v"),
        F.sum("value").over(cum).alias("cum_v"),
        F.avg("value").over(roll3).alias("roll3_v"),
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
    return _r4(out, ["sum_v", "mean_v", "std_v", "max_v", "min_v"])


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
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------
_EV = "TIMESTAMP '2024-01-20 00:00:00'"
_TP = "TIMESTAMP '1998-01-01 00:00:00'"
_U = "(SELECT DISTINCT user_id FROM events)"


def oracle_sql() -> dict[str, str]:
    return {
        "agg_basic": f"""
            SELECT u.user_id,
                   count(e.event_id) AS cnt,
                   floor((coalesce(sum(e.value), 0))*10000 + 0.5)/10000 AS sum_v,
                   floor((avg(e.value))*10000 + 0.5)/10000 AS mean_v,
                   floor((min(e.value))*10000 + 0.5)/10000 AS min_v,
                   floor((max(e.value))*10000 + 0.5)/10000 AS max_v,
                   floor((stddev_pop(e.value))*10000 + 0.5)/10000 AS std_v,
                   floor((var_pop(e.value))*10000 + 0.5)/10000 AS var_v,
                   floor((median(e.value))*10000 + 0.5)/10000 AS med_v
            FROM {_U} u
            LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "agg_time": f"""
            SELECT u.user_id,
                   floor(((epoch_us({_EV}) - epoch_us(max(e.ts))) / 1e6)*10000 + 0.5)/10000 AS tsl,
                   floor(((epoch_us({_EV}) - epoch_us(min(e.ts))) / 1e6)*10000 + 0.5)/10000 AS tsf,
                   floor((CASE WHEN count(e.ts) > 1 THEN
                       (epoch_us(max(e.ts)) - epoch_us(min(e.ts))) / 1e6
                       / (count(e.ts) - 1) END)*10000 + 0.5)/10000 AS atb,
                   floor(((epoch_us(max(e.ts)) - epoch_us(min(e.ts))) / 1e6)*10000 + 0.5)/10000
                       AS fltd
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
                   floor((count(DISTINCT e.event_type) * 1.0
                         / count(e.event_type))*10000 + 0.5)/10000 AS pct_uniq,
                   floor((count(e.event_type) * 1.0
                         / count(DISTINCT e.event_type))*10000 + 0.5)/10000 AS avg_per_uniq,
                   floor((any_value(ent.h))*10000 + 0.5)/10000 AS ent,
                   any_value(md.mode_et) AS mode_et
            FROM {_U} u
            LEFT JOIN f e ON e.user_id = u.user_id
            LEFT JOIN md ON md.user_id = u.user_id AND md.rn = 1
            LEFT JOIN ent ON ent.user_id = u.user_id
            GROUP BY u.user_id
        """,
        "where_clause": f"""
            SELECT u.user_id,
                   floor((coalesce(sum(CASE WHEN e.event_type = 'click'
                                      THEN e.value END), 0))*10000 + 0.5)/10000 AS sum_click,
                   count(CASE WHEN e.event_type = 'click' THEN 1 END)
                       AS cnt_click,
                   floor((avg(CASE WHEN e.event_type = 'click'
                             THEN e.value END))*10000 + 0.5)/10000 AS mean_click
            FROM {_U} u
            LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "training_window": f"""
            SELECT u.user_id,
                   count(e.event_id) AS cnt_5d,
                   floor((coalesce(sum(e.value), 0))*10000 + 0.5)/10000 AS sum_5d
            FROM {_U} u
            LEFT JOIN events e ON e.user_id = u.user_id
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
                   floor((coalesce(sum(e.value), 0))*10000 + 0.5)/10000 AS sum_v,
                   floor((max(e.value))*10000 + 0.5)/10000 AS max_v
            FROM cuts cu
            LEFT JOIN events e ON e.user_id = cu.user_id AND e.ts <= cu.t
            GROUP BY cu.user_id, cu.t
        """,
        "trend": f"""
            SELECT u.user_id,
                   floor((CASE WHEN count(e.value) >= 2
                              AND var_pop(epoch_us(e.ts) / 86400e6) > 0
                         THEN covar_pop(epoch_us(e.ts) / 86400e6, e.value)
                              / var_pop(epoch_us(e.ts) / 86400e6) END)*10000 + 0.5)/10000
                       AS trend_v
            FROM {_U} u
            LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "first_last": f"""
            SELECT u.user_id,
                   floor((arg_min(e.value, e.ts))*10000 + 0.5)/10000 AS first_v,
                   floor((arg_max(e.value, e.ts))*10000 + 0.5)/10000 AS last_v
            FROM {_U} u
            LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
        "multihop": f"""
            SELECT c.c_custkey,
                   count(l.l_orderkey) AS n_li,
                   floor((coalesce(sum(l.l_extendedprice), 0))*10000 + 0.5)/10000 AS sum_price,
                   floor((avg(l.l_extendedprice))*10000 + 0.5)/10000 AS mean_price
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                AND l.l_shipdate <= {_TP}
            GROUP BY c.c_custkey
        """,
        "direct": """
            SELECT o.o_orderkey,
                   floor((c.c_acctbal)*10000 + 0.5)/10000 AS cust_bal,
                   c.c_mktsegment AS cust_seg
            FROM orders o
            LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "sessionize": """
            WITH o AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1e6
                               > 1800 THEN 1 ELSE 0 END AS new_s
                FROM events
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
                   floor((avg(dur))*10000 + 0.5)/10000 AS avg_dur,
                   floor((max(sv))*10000 + 0.5)/10000 AS max_sess_value,
                   max(n_ev) AS max_sess_events
            FROM per_sess GROUP BY user_id
        """,
        "window_transforms": """
            SELECT event_id,
                   floor((lag(value, 1) OVER w)*10000 + 0.5)/10000 AS lag_v,
                   floor((value - lag(value, 1) OVER w)*10000 + 0.5)/10000 AS diff_v,
                   floor((sum(value) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING))*10000 + 0.5)/10000 AS cum_v,
                   floor((avg(value) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))*10000 + 0.5)/10000
                       AS roll3_v
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "dfs_depth1": f"""
            SELECT u.user_id,
                   count(e.event_id) AS cnt,
                   floor((coalesce(sum(e.value), 0))*10000 + 0.5)/10000 AS sum_v,
                   floor((avg(e.value))*10000 + 0.5)/10000 AS mean_v,
                   floor((stddev_pop(e.value))*10000 + 0.5)/10000 AS std_v,
                   floor((max(e.value))*10000 + 0.5)/10000 AS max_v,
                   floor((min(e.value))*10000 + 0.5)/10000 AS min_v,
                   count(DISTINCT e.event_type) AS nu_et
            FROM {_U} u
            LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= {_EV}
            GROUP BY u.user_id
        """,
    }
