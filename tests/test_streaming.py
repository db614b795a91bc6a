"""Structured Streaming smoke: drive a parquet-backed stream through
session windows + sliding windows into a memory sink and compare the
session count with the batch sessionizer."""

from pyspark.sql import functions as F

from featuretools_spark.sessionize import session_stats
from featuretools_spark.streaming import (
    streaming_rolling_agg,
    streaming_session_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _stream_dir(tmp_path):
    """The streaming file source needs a DIRECTORY; the testdata is a
    single parquet file — link it into a temp dir."""
    import os
    d = tmp_path / "events_stream"
    d.mkdir(exist_ok=True)
    os.symlink(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_streaming_sessions_match_batch(spark, tmp_path):
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .load(_stream_dir(tmp_path))
    )
    agg = streaming_session_stats(stream, "user_id", "ts",
                                  gap="30 minutes", value_col="value")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("sess_out").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql(
        "SELECT user_id, count(*) AS n FROM sess_out GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: r["n"] for r in streamed}

    batch = session_stats(
        spark.read.parquet(f"{SF_DIR}/events.parquet"),
        "user_id", "ts", gap="30 minutes",
    )
    want = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_streaming_rolling_agg_runs(spark, tmp_path):
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .load(_stream_dir(tmp_path))
    )
    agg = streaming_rolling_agg(stream, "user_id", "ts", "value",
                                window="6 hours", slide="3 hours")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("roll_out").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n = spark.sql("SELECT count(*) FROM roll_out").collect()[0][0]
    assert n > 0


def test_streaming_running_features_match_batch(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: after the
    stream drains, each entity's final running feature vector must
    equal the batch aggregation over all its events (count / sum /
    mean / population std), leakage-free at each update."""
    from featuretools_spark.streaming import streaming_running_features

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .load(_stream_dir(tmp_path))
    )
    out = streaming_running_features(stream, "user_id", "ts", "value")
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("run_feats").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # latest update per entity (highest asof_epoch)
    got = {
        r["user_id"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER ("
            "PARTITION BY user_id ORDER BY asof_epoch DESC) rn "
            "FROM run_feats) WHERE rn = 1"
        ).collect()
    }
    want = {
        r["user_id"]: r
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("sum_v"),
            F.avg("value").alias("mean_v"),
            F.stddev_pop("value").alias("std_v"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["n"] == w["n"]
        assert abs(g["sum_v"] - w["sum_v"]) < 1e-6
        assert abs(g["mean_v"] - w["mean_v"]) < 1e-9
        assert abs(g["std_v"] - w["std_v"]) < 1e-9


def test_streaming_dedup_matches_batch_canonical(spark, tmp_path):
    """Streaming exact-dedup must emit exactly the batch op's
    canonical survivors (first arrival per content hash) when all
    duplicates fall inside the watermark."""
    import pyspark.sql.functions as F

    from featuretools_spark.ops.dedup import exact_duplicates
    from featuretools_spark.streaming import streaming_dedup

    rows = [
        (1, "alpha text", "2024-01-01 00:00:01"),
        (2, "beta text", "2024-01-01 00:00:02"),
        (3, "alpha text", "2024-01-01 00:00:03"),   # dup of 1
        (4, "gamma text", "2024-01-01 00:00:04"),
        (5, "beta text", "2024-01-01 00:00:05"),    # dup of 2
        (6, "alpha text", "2024-01-01 00:00:06"),   # dup of 1
    ]
    src = tmp_path / "src"
    src.mkdir()
    batch_df = spark.createDataFrame(rows, ["doc_id", "text", "ts"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
    q = streaming_dedup(stream, ["text"], "ts", watermark="10 minutes") \
        .writeStream.format("memory").queryName("sdedup") \
        .outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.sql("SELECT * FROM sdedup").collect()}
    want = {r["doc_id"] for r in
            exact_duplicates(batch_df, ["text"], "doc_id")
            .filter(~F.col("is_duplicate")).collect()}
    assert got == want == {1, 2, 4}
