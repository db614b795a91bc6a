"""Text analysis for training-data pipelines: token counting,
language ID, quality scoring, fingerprinting. All pure Spark
expressions — regex + array functions, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round4(x):
    """floor(x*1e4 + 0.5)/1e4 — IEEE-identical in Spark and DuckDB."""
    return F.floor(x.cast("double") * 10000.0 + F.lit(0.5)).cast("double") / 10000.0

# BPE-ish pre-tokenizer regex (GPT-2 style, simplified to what Java
# regex supports): contractions, word chunks, number chunks,
# punctuation chunks.
BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "de", "est", "que", "pour", "dans", "une"],
    "es": ["el", "la", "los", "que", "de", "es", "en", "por", "con", "una"],
}


def token_count(text_col, mode: str = "whitespace"):
    """Token count: whitespace tokens or a BPE-ish regex pre-tokenizer."""
    if mode == "whitespace":
        t = F.trim(text_col)
        return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))
    return F.regexp_count(text_col, F.lit(BPE_ISH))


def words(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def language_id(text_col):
    """N-gram/stopword-heuristic language ID: score each language by
    its stopword hit count over lowercased whitespace tokens; emit the
    argmax (ties broken by language code order), 'und' if no hits."""
    w = words(text_col)
    scores = [
        (lang, F.size(F.filter(w, lambda x: x.isin(_STOPWORDS[lang]))))
        for lang in sorted(_STOPWORDS)
    ]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        result = F.when((s == best_score) & (best_score > 0), lang).otherwise(result)
    return result


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append document-quality signals: length, word stats,
    punctuation/digit/upper ratios, stopword ratio, quality score."""
    t = F.col(text_col)
    w = words(t)
    n_chars = F.length(t)
    n_words = F.when(F.trim(t) == "", 0).otherwise(F.size(w))
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(F.transform(w, lambda x: F.length(x)), F.lit(0),
                    lambda a, x: a + x).cast("double") / n_words,
    )
    punct = F.regexp_count(t, F.lit(r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"))
    digits = F.regexp_count(t, F.lit(r"[0-9]"))
    uppers = F.regexp_count(t, F.lit(r"[A-Z]"))
    stop_hits = F.size(F.filter(w, lambda x: x.isin(_STOPWORDS["en"])))
    out = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("mean_word_len", _round4(mean_wl))
        .withColumn("punct_ratio",
                    _round4(punct / F.greatest(n_chars, F.lit(1))))
        .withColumn("digit_ratio",
                    _round4(digits / F.greatest(n_chars, F.lit(1))))
        .withColumn("upper_ratio",
                    _round4(uppers / F.greatest(n_chars, F.lit(1))))
        .withColumn("stopword_ratio",
                    _round4(stop_hits / F.greatest(n_words, F.lit(1)).cast("double")))
    )
    # simple composite quality score in [0,1]: reasonable length,
    # moderate punctuation, some stopwords
    score = (
        F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", _round4(score))


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                k: int = 8, hash_fn: str = "xxhash64") -> DataFrame:
    """Document fingerprint: hash of the normalized text (exact), plus
    a winnowed min/max over k-gram rolling hashes (robust).

    hash_fn="xxhash64" (default): bigint fingerprints — the scale
    path (cheap JVM hash, 8-byte values through the shuffle).
    hash_fn="md5": hex-string fingerprints with min/max taken
    lexicographically — identical winnowing structure, but every
    value is recomputable by any SQL engine (the driver's DuckDB
    oracle checks this mode bit-for-bit)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    t = F.trim(norm)
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    if hash_fn == "md5":
        h = lambda c: F.md5(F.encode(c, "UTF-8"))  # noqa: E731
    elif hash_fn == "xxhash64":
        # *cols signature trips F.transform's callback introspection —
        # wrap to a single-arg callable
        h = lambda c: F.xxhash64(c)  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    rolling = F.transform(grams, h)
    return df.select(
        F.col(id_col),
        h(t).alias("exact_fp"),
        F.array_min(rolling).alias("min_gram_fp"),
        F.array_max(rolling).alias("max_gram_fp"),
    )


def repetition_features(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals per doc
    over word n-grams (lowercased whitespace tokens, NON-distinct —
    repetition is the point):

      n_grams         total n-gram occurrences
      top_ngram_frac  occurrences of the single most frequent n-gram
                      / total (ties resolved by count alone — the
                      fraction is tie-invariant)
      dup_ngram_frac  occurrences belonging to n-grams seen more than
                      once / total

    Distributed plan: one explode + groupBy(id, gram) count (map-side
    combinable) + groupBy(id) rollup — shuffles only (id, gram)
    counts, never text. Docs shorter than n tokens emit zero
    fractions."""
    from featuretools_spark.ops.scrub import word_ngrams
    from featuretools_spark.ops.width import ensure_min_width

    grams = ensure_min_width(df.select(F.col(id_col), F.col(text_col))) \
        .select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), n)).alias("_gram"),
        )
    per_gram = grams.groupBy(id_col, "_gram").count()
    agg = per_gram.groupBy(id_col).agg(
        F.sum("count").alias("_total"),
        F.max("count").alias("_top"),
        F.sum(F.when(F.col("count") > 1, F.col("count"))
              .otherwise(F.lit(0))).alias("_dup"),
    )
    out = df.select(id_col).join(agg, id_col, "left")
    tot = F.coalesce(F.col("_total"), F.lit(0))
    return out.select(
        F.col(id_col),
        tot.cast("long").alias("n_grams"),
        _round4(F.when(tot > 0, F.col("_top") / tot).otherwise(F.lit(0.0)))
        .alias("top_ngram_frac"),
        _round4(F.when(tot > 0, F.col("_dup") / tot).otherwise(F.lit(0.0)))
        .alias("dup_ngram_frac"),
    )
