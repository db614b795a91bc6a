"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — broadcast the (small) query
  side, JVM-side dot product via F.zip_with/F.aggregate, window
  row_number for top-k. The correctness baseline.
- lsh_topk: random-hyperplane LSH — deterministic pseudo-random
  planes derived from hash(seed, plane, dim), signature = sign bits,
  bucket-join on (plane-band) then exact re-rank inside buckets.
  The scale path: candidate set per query is a bucket, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row. The query side
    is broadcast (it is small by construction); the corpus scan is
    one pass, no shuffle until the per-query top-k window (which
    shuffles only (query, id, score) triples)."""
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qv")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qv")).alias("score"),
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_component(plane: int, dim: int, seed: int = 42):
    """Deterministic pseudo-random plane component in [-1, 1): derived
    from hash(seed, plane, dim) — reproducible across runs/executors
    with no RNG state."""
    h = F.hash(F.lit(seed), F.lit(plane), F.lit(dim))
    return (F.pmod(h, F.lit(2001)).cast("double") - 1000.0) / 1000.0


def rh_signature(df: DataFrame, vec_col: str, n_planes: int = 16,
                 seed: int = 42, dim: int | None = None) -> DataFrame:
    """Append an int signature column `rh_sig`: bit p = sign of the
    dot product with pseudo-random plane p."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig = F.lit(0).cast("long")
    v = F.col(vec_col)
    for p in range(n_planes):
        dot = None
        for d in range(dim):
            term = F.element_at(v, d + 1).cast("double") * _plane_component(p, d, seed)
            dot = term if dot is None else dot + term
        sig = sig + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(0)
    return df.withColumn("rh_sig", sig)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows whose
    random-hyperplane signature matches the query's in at least one of
    three 4-bit bands; exact cosine re-rank inside the candidate set."""
    dim = len(corpus.select(vec_col).first()[0])
    c = rh_signature(corpus, vec_col, n_planes, seed, dim)
    q = rh_signature(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.col(query_vec_col).alias("__qv"),
        ),
        "__qv", n_planes, seed, dim,
    ).withColumnRenamed("rh_sig", "q_sig")
    band_bits = n_planes // 3
    mask = (1 << band_bits) - 1

    def bands(col):
        return F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(col, band_bits * i)
                .bitwiseAND(F.lit(mask)).alias("val"),
            )
            for i in range(3)
        ])

    cb = c.select(id_col, vec_col, F.explode(bands(F.col("rh_sig"))).alias("b")) \
          .select(id_col, vec_col, "b.band", "b.val")
    qb = q.select("__qid", "__qv", F.explode(bands(F.col("q_sig"))).alias("b")) \
          .select("__qid", "__qv", "b.band", "b.val")
    cand = cb.join(F.broadcast(qb), on=["band", "val"]).dropDuplicates(
        ["__qid", id_col]
    )
    scored = cand.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qv")).alias("score"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
