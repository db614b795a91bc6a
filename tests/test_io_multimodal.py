"""Resumable backfill checkpoints + multimodal Arrow plumbing."""

import datetime as dt
import json
import os
import shutil

from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.features import AggregationFeature, IdentityFeature
from featuretools_spark.io import backfill_with_checkpoints, bucket_of
from featuretools_spark.ops.multimodal import (
    frame_sample,
    image_features,
    make_fake_media,
)

CUT = dt.datetime(2024, 1, 20)


def test_backfill_checkpoint_resume(es, spark, tmp_path):
    out_dir = str(tmp_path / "bf")

    def build(bucket, n_buckets):
        v = IdentityFeature(es, "events", "value")
        feats = [AggregationFeature(v, "users", "sum", es=es)]
        cuts = (
            es["users"].select("user_id")
            .filter(bucket_of(F.col("user_id"), n_buckets) == bucket)
            .withColumn("time", F.lit(CUT))
        )
        return fts.calculate_feature_matrix(feats, es, cutoff_time=cuts)

    s1 = backfill_with_checkpoints(build, out_dir, n_buckets=4, spark=spark)
    assert s1["total_rows"] == es["users"].count()
    assert not s1["resumed"]
    # second run: everything resumes from manifests
    s2 = backfill_with_checkpoints(build, out_dir, n_buckets=4, spark=spark)
    assert sorted(s2["resumed"]) == [0, 1, 2, 3]
    assert s2["total_rows"] == s1["total_rows"]
    # delete one bucket -> only it recomputes
    shutil.rmtree(os.path.join(out_dir, "bucket=2"))
    s3 = backfill_with_checkpoints(build, out_dir, n_buckets=4, spark=spark)
    assert sorted(s3["resumed"]) == [0, 1, 3]
    assert s3["total_rows"] == s1["total_rows"]
    # manifests carry lineage-ish metadata
    with open(os.path.join(out_dir, "bucket=0", "_MANIFEST.json")) as fh:
        m = json.load(fh)
    assert m["rows"] > 0 and "columns" in m and "wall_s" in m


def test_multimodal_plumbing(spark):
    media = make_fake_media(spark, 60)
    feats = image_features(media, strict=False)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["img_features"]) == 8 for r in rows)
    # deterministic: same input -> same features
    again = {r["media_id"]: r["img_features"] for r in feats.collect()}
    first = {r["media_id"]: r["img_features"] for r in rows}
    assert first == again

    frames = frame_sample(media, every_s=10.0)
    fr = frames.collect()
    assert len(fr) > 60  # multiple frames for longer media
    assert {f["frame_idx"] for f in fr if f["frame_idx"] == 0}


def test_multimodal_strict_raises(spark):
    media = make_fake_media(spark, 5)
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        image_features(media, strict=True).collect()
