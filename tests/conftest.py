import datetime as dt

import pytest
from pyspark.sql import functions as F

from featuretools_spark.session import get_spark
from featuretools_spark.entityset import EntitySet

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ft_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def es(spark):
    """EntitySet over the driver testdata: customer <- orders <- lineitem,
    users <- events."""
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    users = events.select(F.col("user_id")).distinct()

    es = EntitySet("test")
    es.add_dataframe("customer", customer, index="c_custkey")
    es.add_dataframe("orders", orders, index="o_orderkey", time_index="o_orderdate")
    es.add_dataframe(
        "lineitem",
        lineitem.withColumn(
            "_li_id",
            F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        ),
        index="_li_id",
        time_index="l_shipdate",
    )
    es.add_dataframe("users", users, index="user_id")
    es.add_dataframe(
        "events",
        events,
        index="event_id",
        time_index="ts",
        logical_types={"event_type": "Categorical"},
    )
    es.add_relationship("customer", "c_custkey", "orders", "o_custkey")
    es.add_relationship("orders", "o_orderkey", "lineitem", "l_orderkey")
    es.add_relationship("users", "user_id", "events", "user_id")
    return es


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


CUTOFF = dt.datetime(2024, 1, 20)
