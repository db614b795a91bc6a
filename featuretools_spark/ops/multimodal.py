"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schemas, batching, partition sizing, UDF
signatures) is real and tested; the actual codec calls are stubbed —
the image/audio libraries are not in this container. Each stub either
raises NotImplementedError (strict mode) or produces a deterministic
fake derived from the bytes (test mode), so pipelines can be
exercised end-to-end.

Pattern: mapInPandas over an iterator of Arrow batches — binary
payloads never pass through row-at-a-time Python, and
maxRecordsPerBatch bounds executor memory for large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),  # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
])


def _fake_decode(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode+embed: n floats derived
    from byte content. Replace with a real codec (PIL/torchaudio/
    ffmpeg) in production — marked clearly as a STUB."""
    if payload is None:
        return [0.0] * n
    acc, out = 2166136261, []
    for i, b in enumerate(payload[:256]):
        acc = (acc ^ b) * 16777619 % (1 << 32)
        if i % (256 // n or 1) == (256 // n or 1) - 1 and len(out) < n:
            out.append((acc % 2000 - 1000) / 1000.0)
    while len(out) < n:
        acc = acc * 1103515245 % (1 << 31)
        out.append((acc % 2000 - 1000) / 1000.0)
    return out


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Decode → feature-extract images, batched via mapInPandas.

    strict=True raises NotImplementedError (no codec in container);
    strict=False produces the deterministic fake embedding so the
    Spark plumbing (schema, partitioning, Arrow batching) is testable.
    """
    out_schema = (
        f"{id_col} string, img_features array<float>, n_bytes int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image codec not available in this container — "
                    "plug PIL/opencv here"
                )
            feats = [_fake_decode(p, n_features) for p in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].astype(str),
                "img_features": feats,
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_s: float = 1.0,
    strict: bool = False,
) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame with
    (media_id, frame_idx, frame_t, frame_features). Real impl would
    call ffmpeg per Arrow batch."""
    out_schema = (
        f"{id_col} string, frame_idx int, frame_t double, "
        "frame_features array<float>"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video codec not in container")
            rows = {"media_id": [], "frame_idx": [], "frame_t": [],
                    "frame_features": []}
            for mid, payload, dur in zip(
                pdf[id_col], pdf[payload_col], pdf["duration_s"]
            ):
                n_frames = max(int((dur or 0.0) / every_s), 1)
                for i in range(min(n_frames, 16)):
                    rows["media_id"].append(str(mid))
                    rows["frame_idx"].append(i)
                    rows["frame_t"].append(i * every_s)
                    rows["frame_features"].append(
                        _fake_decode((payload or b"") + bytes([i]))
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col, "duration_s").mapInPandas(
        sample, out_schema
    )


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    base = spark.range(n)
    return base.select(
        F.concat(F.lit("m"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.hash(F.col("id")), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.hash(F.col("id"), F.lit(1)), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.hash(F.col("id"), F.lit(2)), F.lit(600)).cast("double") / 10.0).alias("duration_s"),
    )
