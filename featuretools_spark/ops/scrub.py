"""Pipeline-hygiene ops for training-data curation: PII redaction and
benchmark decontamination. Both are pure Spark expressions / joins —
no Python UDFs — and both are engine-agnostic (regexes restricted to
the Java-regex ∩ RE2 common subset; gram construction mirrors DuckDB
list functions) so the driver oracle can recompute them exactly.

No reference analog: featuretools has no text-curation surface; these
belong to the LLM-training-pipeline op set (SURVEY round brief),
alongside ops/dedup.py and ops/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: PII patterns — deliberately conservative syntax (\b, \d, character
#: classes, bounded quantifiers, non-capturing groups) that Java regex
#: and RE2/DuckDB interpret identically. Order matters: counts are
#: taken on the ORIGINAL text (order-independent), replacements apply
#: in this sequence.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "redacted",
    kinds: tuple[str, ...] = ("email", "ssn", "phone", "ipv4"),
) -> DataFrame:
    """Redact PII spans in `text_col`, appending `out_col` (the
    scrubbed text, each match replaced by `[KIND]`) and one
    `n_<kind>` count column per kind (counted on the original text,
    so counts do not depend on replacement order).

    All regexp_replace / regexp_count Column expressions — runs in
    whole-stage codegen, scales as a pure map (no shuffle)."""
    for k in kinds:
        if k not in PII_PATTERNS:
            raise ValueError(
                f"unknown PII kind {k!r}: have {sorted(PII_PATTERNS)}")
    t = F.col(text_col)
    out = df
    for k in kinds:
        out = out.withColumn(
            f"n_{k}", F.regexp_count(t, F.lit(PII_PATTERNS[k])))
    red = t
    for k in kinds:
        red = F.regexp_replace(red, PII_PATTERNS[k], f"[{k.upper()}]")
    return out.withColumn(out_col, red)


def word_ngrams(text_col, n: int):
    """Lowercased whitespace-token n-grams as an array<string> Column
    (space-joined), the unit of benchmark decontamination. Documents
    shorter than n tokens produce an empty array."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    m = F.size(toks) - F.lit(n - 1)
    # guard: F.sequence(1, 0) COUNTS DOWN ([1, 0]) instead of being
    # empty, and slice(start=0) throws — short docs get [] explicitly
    return F.when(
        m < 1, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame, id_col: str, text_col: str,
    bench_text_col: str | None = None, n: int = 5,
) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap (the
    GPT-3/Llama-report recipe at configurable n): a document is
    contaminated when it shares at least one word n-gram with any
    benchmark text. Returns (id_col, n_matched, contaminated) for
    EVERY doc — n_matched = number of DISTINCT benchmark grams the
    doc contains.

    Scale design: eval benchmarks are small by definition, so their
    distinct gram set is BROADCAST; the corpus side is one projection
    + explode + broadcast-hash semi-join (no corpus shuffle), and the
    per-doc distinct count aggregates only the matched rows (tiny).
    The left join back to `docs` keys is broadcast-friendly the same
    way at the driver's scales and hash-joins beyond."""
    bench_text_col = bench_text_col or text_col
    bgrams = (
        benchmark
        .select(F.explode(word_ngrams(F.col(bench_text_col), n))
                .alias("_gram"))
        .distinct()
    )
    from featuretools_spark.ops.width import ensure_min_width

    dgrams = ensure_min_width(docs.select(F.col(id_col), F.col(text_col))) \
        .select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), n)).alias("_gram"),
        )
    # the distinct runs AFTER the broadcast semi-join: matched rows
    # are tiny (benchmark-sized), so the dedup shuffles only those —
    # a pre-join distinct would shuffle every (id, raw n-gram) pair
    # of the WHOLE corpus (measured 61 MiB / 2.5M records at sf1,
    # where post-join it is ~0)
    matched = (
        dgrams.join(F.broadcast(bgrams), "_gram")
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        docs.select(id_col)
        .join(matched, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long")
            .alias("n_matched"),
            (F.coalesce(F.col("n_matched"), F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )
