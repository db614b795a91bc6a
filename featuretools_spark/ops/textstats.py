"""Text analysis for training-data pipelines: token counting,
language ID, quality scoring, fingerprinting. All pure Spark
expressions — regex + array functions, no Python UDFs.
"""

from __future__ import annotations

import pandas as pd
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

    # ZERO-shuffle formulation: per-gram counts of one document are a
    # run-length scan of its SORTED gram array, so the three signals
    # fold out of one per-row pass — no explode, no groupBy(id, gram)
    # + rollup exchanges of raw gram strings (the r6 shape shuffled
    # every (id, gram, count) row twice; guide §2.3/§2.4). State:
    # (prev gram, current run length, best closed run, dup total);
    # closing a run folds it into best/dup exactly like the old
    # max(count) / sum(count where count > 1) aggregates.
    sorted_g = F.array_sort(word_ngrams(F.col(text_col), n))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
    )

    def _step(st, x):
        same = st["prev"].isNotNull() & (x == st["prev"])
        closed_top = F.greatest(st["top"], st["cur"])
        closed_dup = st["dup"] + F.when(
            st["cur"] > 1, st["cur"]).otherwise(F.lit(0).cast("long"))
        return F.struct(
            x.alias("prev"),
            F.when(same, st["cur"] + 1)
             .otherwise(F.lit(1).cast("long")).alias("cur"),
            F.when(same, st["top"]).otherwise(closed_top).alias("top"),
            F.when(same, st["dup"]).otherwise(closed_dup).alias("dup"),
        )

    def _fin(st):
        return F.struct(
            F.greatest(st["top"], st["cur"]).alias("top"),
            (st["dup"] + F.when(st["cur"] > 1, st["cur"])
             .otherwise(F.lit(0).cast("long"))).alias("dup"),
        )

    staged = ensure_min_width(df.select(F.col(id_col), F.col(text_col))) \
        .withColumn("_sorted", sorted_g)
    stats = staged.select(
        F.col(id_col),
        F.coalesce(F.size("_sorted"), F.lit(0)).cast("long").alias("_tot"),
        F.aggregate(
            F.coalesce(F.col("_sorted"),
                       F.expr("CAST(array() AS array<string>)")),
            init, _step, _fin).alias("_st"),
    )
    tot = F.col("_tot")
    return stats.select(
        F.col(id_col),
        tot.alias("n_grams"),
        _round4(F.when(tot > 0, F.col("_st.top") / tot)
                .otherwise(F.lit(0.0))).alias("top_ngram_frac"),
        _round4(F.when(tot > 0, F.col("_st.dup") / tot)
                .otherwise(F.lit(0.0))).alias("dup_ngram_frac"),
    )


# Witness merge table for the driver's DuckDB oracle: every merge
# output is consumed only by LATER merges and no pair member ever
# reappears as a byproduct of another merge (merging two symbols into
# a fresh one can only DESTROY adjacencies between base characters,
# never create them). Under that property, priority-loop BPE over
# words is exactly equivalent to applying each merge exhaustively
# left-to-right in rank order over the whole string — which is a
# chain of replace() calls with one sentinel char per merged symbol,
# i.e. something DuckDB can replay bit-for-bit (the same
# witness-oracle trick as fingerprint's md5 mode). The ENGINE does
# not rely on the property: bpe_token_count runs the general
# lowest-rank-present loop and handles arbitrary vocabs.
#
# WITNESS CONTRACT (ADVICE r7): the oracle's replay additionally
# assumes the corpus text contains no control chars \x01-\x08 (the
# oracle's merge sentinels) and no non-ASCII whitespace — the oracle
# tokenizes words with an ASCII \s regex while the engine uses
# Python str.split() (Unicode whitespace), and the engine treats
# \x01-\x08 as ordinary base symbols. The driver's documents
# satisfy both (ASCII-printable text); corpora that don't must
# normalize before the witness comparison (the ENGINE's own counts
# are well-defined either way).
WITNESS_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"),
    ("a", "n"), ("o", "n"), ("r", "e"), ("a", "t"),
]


def bpe_token_count(df: DataFrame, id_col: str, text_col: str,
                    merges, out_col: str = "bpe_tokens") -> DataFrame:
    """Exact token count under real byte-pair-encoding merge rules
    (reference: featuretools has no tokenizer surface; contract is
    the standard tokenizers merges.txt semantics — VERDICT r6 task #5
    upgrading the BPE-ish regex count to trustworthy accounting).

    ``merges`` is an ordered list of (left, right) symbol pairs; rank
    = list index. Symbols are strings and merging (a, b) yields the
    symbol a+b, so chained entries like ("t","h") then ("th","e")
    compose the way real vocabs do. Per word (maximal non-whitespace
    run of the lowercased text, chars as base symbols) the
    lowest-rank pair present is merged left-to-right until no vocab
    pair remains; the result is total surviving symbols over all
    words. NULL text -> NULL; empty/whitespace-only -> 0.

    Scale design: a pure map — zero shuffle. The merge table is a
    Spark broadcast read once per executor; the Arrow-batched UDF
    memoizes word -> count so Python CPU scales with DISTINCT words
    per batch (Zipf head dominates), not corpus tokens. At real scale
    the same seam takes a compiled tokenizer (tiktoken /
    HF tokenizers); this pure-Python loop is the reference the
    DuckDB oracle can replay (see WITNESS_BPE_MERGES)."""
    from pyspark.sql.functions import pandas_udf

    b_merges = df.sparkSession.sparkContext.broadcast(
        [tuple(p) for p in merges])

    @pandas_udf("long")
    def _bpe_count(texts: pd.Series) -> pd.Series:
        ranks = {p: i for i, p in enumerate(b_merges.value)}
        memo: dict = {}

        def word_tokens(w: str) -> int:
            n = memo.get(w)
            if n is not None:
                return n
            syms = list(w)
            while len(syms) > 1:
                best_rank = None
                best_pair = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None
                                          or r < best_rank):
                        best_rank, best_pair = r, (syms[i], syms[i + 1])
                if best_pair is None:
                    break
                a, b = best_pair
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[w] = len(syms)
            return memo[w]

        return pd.Series(
            [None if t is None
             else sum(word_tokens(w) for w in t.split())
             for t in texts],
            dtype="Int64")

    return df.select(
        F.col(id_col),
        _bpe_count(F.lower(F.col(text_col))).alias(out_col),
    )
