"""Deterministic synthetic data for the BASELINE.json target table.

Generates the north-rule input shape — pre-tokenized training
sequences (doc_id:string, tokens:array<int32>, n_tok:int32,
source:string) plus an event time and an entity key (FIXTURES.md F1)
— entirely inside Spark (spark.range + hash-derived columns): no
driver-side data, deterministic across runs/partitionings, scalable
to any row count. ~1% of entities are "hot" and own ~30% of rows to
exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257
ANCHOR = "2024-01-01 00:00:00"


def make_sequences(
    spark: SparkSession,
    n_rows: int = 10_000,
    n_entities: int = 500,
    max_tok: int = 512,
    hot_row_frac: float = 0.3,
    n_hot: int | None = None,
) -> DataFrame:
    """One row per pre-tokenized training sequence. n_hot entities
    share hot_row_frac of all rows (default ~1% of entities own ~30%);
    pass n_hot=1 for a single pathological hot key (skew benches)."""
    if n_hot is None:
        n_hot = max(1, n_entities // 100)
    df = spark.range(n_rows)
    i = F.col("id")
    h = lambda *salts: F.abs(F.hash(i.cast("int"), *[F.lit(s) for s in salts]))
    n_tok = (F.lit(1) + F.pmod(h(1), F.lit(max_tok))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda j: F.pmod(F.hash(i.cast("int"), j.cast("int"), F.lit(7)),
                         F.lit(VOCAB)).cast("int"),
    )
    source = (
        F.when(F.pmod(h(2), F.lit(4)) == 0, "web")
        .when(F.pmod(h(2), F.lit(4)) == 1, "books")
        .when(F.pmod(h(2), F.lit(4)) == 2, "code")
        .otherwise("wiki")
    )
    event_time = F.to_timestamp(F.lit(ANCHOR)) + F.make_interval(
        secs=F.pmod(h(3), F.lit(10_000_000)).cast("double")
    )
    is_hot = F.pmod(h(4), F.lit(1000)) < int(hot_row_frac * 1000)
    entity_num = F.when(
        is_hot, F.pmod(h(5), F.lit(n_hot))
    ).otherwise(F.pmod(h(6), F.lit(n_entities)))
    return df.select(
        F.format_string("doc%08d", i).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
        event_time.alias("event_time"),
        F.format_string("e%05d", entity_num).alias("entity_id"),
    )


def make_entities(sequences: DataFrame) -> DataFrame:
    return sequences.groupBy("entity_id").agg(
        F.min("event_time").alias("first_seen")
    )


def make_cutoffs(
    spark: SparkSession, sequences: DataFrame, per_entity: int = 3
) -> DataFrame:
    """2-5 cutoff times per entity straddling its event times: one
    before the first event (default rows), one mid-stream, one at
    exactly an event time (exercises include_cutoff_time), one after."""
    stats = sequences.groupBy("entity_id").agg(
        F.min("event_time").alias("t0"),
        F.max("event_time").alias("t1"),
        F.max_by("event_time", "doc_id").alias("t_exact"),
    )
    base = F.array(
        (F.col("t0") - F.expr("INTERVAL 1 DAY")).alias("c"),
        F.timestamp_micros(
            ((F.unix_micros("t0") + F.unix_micros("t1")) / 2)
            .cast("long")
        ),
        F.col("t_exact"),
        F.col("t1") + F.expr("INTERVAL 1 HOUR"),
    )
    if per_entity > 4:
        # dense mode: the 4 shape-exercising cutoffs plus per_entity-4
        # points evenly spaced over the entity's event span
        u0, u1 = F.unix_micros("t0"), F.unix_micros("t1")
        k = per_entity - 4
        extras = F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.timestamp_micros(
                (u0 + (u1 - u0) * i.cast("long") / F.lit(k + 1))
                .cast("long")
            ),
        )
        base = F.concat(base, extras)
    cuts = stats.select(
        "entity_id",
        F.explode(F.slice(base, 1, per_entity)).alias("time"),
    )
    return cuts.withColumn(
        "label",
        (F.pmod(F.xxhash64("entity_id", "time"), F.lit(1000)) / 1000.0),
    )
