"""fastText-style linear classifier inference (VERDICT r6 stretch #9).

Reference analog: none — featuretools has no text surface. Public
pattern: Joulin et al. 2016 (hashed n-gram bag + linear layer).
"""
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from featuretools_spark.ops.classify import classifier_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _grams(text):
    toks = text.strip().lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _buckets(spark, grams, n_buckets):
    """Ground-truth buckets straight from the JVM hash the op uses."""
    df = spark.createDataFrame([(g,) for g in grams], ["g"])
    got = {r["g"]: r["b"] for r in df.select(
        "g", F.pmod(F.xxhash64("g"), F.lit(n_buckets)).alias("b")
    ).collect()}
    return [got[g] for g in grams]


def test_weights_mode_matches_numpy(spark):
    """Trained-weights path: score == sigmoid(bias + mean(w[bucket]))
    with buckets recomputed independently from the same JVM hash."""
    rng = np.random.default_rng(7)
    w = rng.normal(size=64)
    text = "The quick brown Fox jumps"
    out = classifier_score(
        _docs(spark, [(1, text)]), "doc_id", "text",
        weights=w, bias=-0.3,
    ).collect()[0]
    idx = _buckets(spark, _grams(text), 64)
    lin = -0.3 + w[np.asarray(idx)].mean()
    assert out["n_grams"] == len(idx) == 9
    assert out["linear_score"] == pytest.approx(lin, abs=1e-4)
    assert out["quality_prob"] == pytest.approx(
        1.0 / (1.0 + math.exp(-lin)), abs=1e-4)


def test_weights_mode_planted_separation(spark):
    """Weights planted on one doc's buckets push its score to ~1 and
    the other doc's to ~0 — the filter actually separates."""
    good = "verified thorough wellwritten prose"
    bad = "spamspam clickbait garbage zzzz"
    n_buckets = 256
    w = np.zeros(n_buckets)
    for b in _buckets(spark, _grams(good), n_buckets):
        w[b] += 8.0
    for b in _buckets(spark, _grams(bad), n_buckets):
        w[b] -= 8.0
    got = {r["doc_id"]: r["quality_prob"] for r in classifier_score(
        _docs(spark, [(1, good), (2, bad)]), "doc_id", "text",
        weights=w,
    ).collect()}
    assert got[1] > 0.99
    assert got[2] < 0.01


def test_empty_null_and_bias(spark):
    """Empty/whitespace docs score sigmoid(bias); NULL text -> NULL."""
    out = {r["doc_id"]: r for r in classifier_score(
        _docs(spark, [(1, ""), (2, "   "), (3, None)]),
        "doc_id", "text", weights=np.ones(8), bias=1.5,
    ).collect()}
    want = round(1.0 / (1.0 + math.exp(-1.5)), 4)
    assert out[1]["n_grams"] == 0 and out[1]["quality_prob"] == want
    assert out[2]["n_grams"] == 0 and out[2]["quality_prob"] == want
    assert out[3]["n_grams"] is None
    assert out[3]["quality_prob"] is None


def test_witness_mode_matches_duckdb(spark):
    """md5-witness path equals the DuckDB replay (the oracle
    contract), including empty and punctuation-heavy docs."""
    duckdb = pytest.importorskip("duckdb")
    texts = [
        "The rain in Spain stays mainly on the plain",
        "one",
        "repeat repeat repeat repeat",
        "MiXeD CaSe   with   extra   spaces",
        "punctuation, everywhere! 123",
        "",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: r for r in classifier_score(
            _docs(spark, rows), "doc_id", "text", bias=0.25,
        ).collect()
    }
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = """
        WITH toks AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(lower(trim(text)), '\\s+')
                   END AS tk
            FROM docs
        ), g AS (
            SELECT doc_id, list_concat(tk, list_transform(
                       range(1, greatest(len(tk) - 1, 0) + 1),
                       i -> tk[i] || ' ' || tk[i + 1])) AS grams
            FROM toks
        )
        SELECT doc_id, len(grams) AS n_grams,
               0.25 + CASE WHEN len(grams) > 0 THEN
                   COALESCE(list_sum(list_transform(grams,
                       x -> ('0x' || substr(md5(x), 1, 8))::BIGINT
                            / 4294967296.0 - 0.5)), 0.0) / len(grams)
               ELSE 0.0 END AS lin
        FROM g
    """
    for doc_id, n_grams, lin in con.execute(sql).fetchall():
        r = got[doc_id]
        assert r["n_grams"] == n_grams
        assert r["linear_score"] == math.floor(lin * 10000 + 0.5) / 10000
        sig = 1.0 / (1.0 + math.exp(-lin))
        assert r["quality_prob"] == pytest.approx(
            math.floor(sig * 10000 + 0.5) / 10000, abs=1e-9)


def test_weights_validation(spark):
    with pytest.raises(ValueError, match="non-empty 1-D"):
        classifier_score(_docs(spark, [(1, "x")]), "doc_id", "text",
                         weights=np.zeros((2, 2)))
    with pytest.raises(ValueError, match="md5"):
        classifier_score(_docs(spark, [(1, "x")]), "doc_id", "text",
                         hash_fn="xxhash64")
