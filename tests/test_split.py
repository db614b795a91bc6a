"""Deterministic hash splits / sampling (ops/split.py).

No reference analog — featuretools has no sampling surface; the
contract (key-deterministic, partition-invariant, nesting) is what
training pipelines require of durable splits.
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from featuretools_spark.ops.split import (
    hash_split,
    sample_by_hash,
    stratified_sample_by_hash,
)

FRACS = [("train", 0.75), ("val", 0.125), ("test", 0.125)]


def _ids(spark, n=4000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_split_disjoint_exhaustive_deterministic(spark):
    df = _ids(spark)
    a = {r["doc_id"]: r["split"]
         for r in hash_split(df, "doc_id", FRACS, seed="s").collect()}
    # recompute on a differently-partitioned frame: labels identical
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(13), "doc_id", FRACS,
                             seed="s").collect()}
    assert a == b
    assert len(a) == 4000
    assert set(a.values()) == {"train", "val", "test"}


def test_split_proportions_and_seed_redeal(spark):
    df = _ids(spark)
    out = hash_split(df, "doc_id", FRACS, seed="s") \
        .groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert abs(counts["train"] / 4000 - 0.75) < 0.05
    assert abs(counts["val"] / 4000 - 0.125) < 0.03
    assert abs(counts["test"] / 4000 - 0.125) < 0.03
    a = {r["doc_id"]: r["split"]
         for r in hash_split(df, "doc_id", FRACS, seed="s").collect()}
    c = {r["doc_id"]: r["split"]
         for r in hash_split(df, "doc_id", FRACS, seed="t").collect()}
    assert sum(a[k] != c[k] for k in a) > 1000  # seed re-deals


def test_sample_nesting(spark):
    df = _ids(spark)
    small = {r["doc_id"] for r in
             sample_by_hash(df, "doc_id", 0.2, seed="s").collect()}
    big = {r["doc_id"] for r in
           sample_by_hash(df, "doc_id", 0.6, seed="s").collect()}
    assert small <= big
    assert len(small) < len(big) < 4000


def test_stratified_rates_and_incremental_reweigh(spark):
    df = _ids(spark).withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "web")
                   .otherwise("code"))
    only_code = stratified_sample_by_hash(
        df, "doc_id", "source", {"code": 1.0, "web": 0.0}).collect()
    assert all(r["source"] == "code" for r in only_code)
    assert len(only_code) == 2000
    lo = {r["doc_id"] for r in stratified_sample_by_hash(
        df, "doc_id", "source", {"web": 0.3}, default=0.0).collect()}
    hi = {r["doc_id"] for r in stratified_sample_by_hash(
        df, "doc_id", "source", {"web": 0.7}, default=0.0).collect()}
    assert lo <= hi  # raising a rate only ADDS rows


def test_md5_mode_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(i,) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id"])
    got = {r["doc_id"]: r["split"] for r in hash_split(
        df, "doc_id", FRACS, seed="r7", hash_fn="md5").collect()}
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id"]))
    want = dict(con.execute("""
        SELECT doc_id,
               CASE WHEN u < 0.75 THEN 'train'
                    WHEN u < 0.875 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substr(md5(doc_id::VARCHAR || '|r7'),
                                     1, 8))::BIGINT / 4294967296.0 AS u
              FROM docs)
    """).fetchall())
    assert got == want


def test_validation(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", [("a", 0.5), ("b", 0.4)])
    with pytest.raises(ValueError, match="fraction"):
        sample_by_hash(df, "doc_id", 1.5)
    with pytest.raises(ValueError, match="hash_fn"):
        sample_by_hash(df, "doc_id", 0.5, hash_fn="sha1")
