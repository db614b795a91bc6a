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
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row. The query side
    is broadcast (it is small by construction); the corpus scan is
    one pass, no shuffle until the per-query top-k window (which
    shuffles only (query, id, score) triples).

    The broadcast cross-join is O(|corpus| x |queries|): queries above
    max_query_rows are REFUSED — use lsh_topk (bucketed candidates)
    for large query sides, or raise the cap deliberately."""
    nq = queries.count()
    if nq > max_query_rows:
        raise ValueError(
            f"brute_force_topk broadcasts the query side and scores "
            f"|corpus| x |queries| pairs: {nq} query rows > "
            f"max_query_rows={max_query_rows}; use lsh_topk for large "
            f"query sets or raise max_query_rows explicitly"
        )
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


def rh_signature(df: DataFrame, vec_col: str, n_planes: int = 16,
                 seed: int = 42) -> DataFrame:
    """Append a long signature column `rh_sig`: bit p = sign of the
    dot product with pseudo-random plane p. Plane components are
    hash-derived in [-1, 1) on the fly (hash(seed, plane, position) —
    deterministic across runs/executors, no RNG state), and the whole
    signature is ONE nested array-aggregate expression: plan size is
    O(1) in both n_planes and embedding dimension (the old per-term
    unrolling built ~n_planes x dim Column nodes — ~9k at dim=768),
    and no driver action is needed to discover the dimension."""
    v = F.col(vec_col)

    def plane_component(p, d):
        h = F.hash(F.lit(seed), p.cast("int"), d.cast("int"))
        return (F.pmod(h, F.lit(2001)).cast("double") - 1000.0) / 1000.0

    def dot_with_plane(p):
        return F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x.cast("double") * plane_component(p, d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # fold planes high-to-low: acc*2 + sign_bit (shiftleft needs a
    # literal shift amount, so build the integer positionally)
    sig = F.aggregate(
        F.sequence(F.lit(n_planes - 1), F.lit(0), F.lit(-1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc * F.lit(2).cast("long") + F.when(
            dot_with_plane(p) > 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
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
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows whose
    random-hyperplane signature matches the query's in at least one
    4-bit band of any of n_tables independent hash tables; exact
    cosine re-rank inside the candidate set. Recall is tuned by
    n_tables (more tables -> higher recall, more candidates) and by
    band width (n_planes/3 bits -> wider bands are more selective at
    corpus scale)."""

    def with_sigs(df, vcol):
        for t in range(n_tables):
            df = rh_signature(df, vcol, n_planes, seed + 7919 * t) \
                .withColumnRenamed("rh_sig", f"__sig{t}")
        return df

    c = with_sigs(corpus, vec_col)
    q = with_sigs(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.col(query_vec_col).alias("__qv"),
        ),
        "__qv",
    )
    band_bits = n_planes // 3
    mask = (1 << band_bits) - 1

    def bands(prefix):
        return F.array(*[
            F.struct(
                F.lit(t * 3 + i).alias("band"),
                F.shiftrightunsigned(F.col(f"{prefix}{t}"), band_bits * i)
                .bitwiseAND(F.lit(mask)).alias("val"),
            )
            for t in range(n_tables)
            for i in range(3)
        ])

    cb = c.select(id_col, vec_col, F.explode(bands("__sig")).alias("b")) \
          .select(id_col, vec_col, "b.band", "b.val")
    qb = q.select("__qid", "__qv", F.explode(bands("__sig")).alias("b")) \
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
