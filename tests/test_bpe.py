"""Real merge-rank BPE token counting (VERDICT r6 #5).

Reference analog: none — featuretools has no tokenizer surface; the
contract is the standard tokenizers merges.txt semantics (ordered
pair list, lowest rank merged first, all occurrences left-to-right).
"""
import pandas as pd
import pytest

from featuretools_spark.ops.textstats import (
    WITNESS_BPE_MERGES,
    bpe_token_count,
)


def _counts(spark, rows, merges):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bpe_token_count(df, "doc_id", "text", merges)
    return {r["doc_id"]: r["bpe_tokens"] for r in out.collect()}


def _ref_bpe(word, merges):
    """Independent O(n^2) reference: merge the single lowest-rank
    pair occurrence at a time (one occurrence per step — a different
    application order than the engine's all-occurrences-per-round
    loop, but provably the same fixpoint symbol count)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    syms = list(word)
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            return len(syms)
        i = best[1]
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]


def test_priority_order_decides_count(spark):
    """'her' with merges [er, he, he+r]: rank-0 (e,r) must win over
    (h,e) -> [h, er] -> 2 tokens. A greedy-leftmost or wrong-priority
    tokenizer would produce [he, r] -> [her] -> 1."""
    merges = [("e", "r"), ("h", "e"), ("he", "r")]
    got = _counts(spark, [(1, "her")], merges)
    assert got[1] == 2


def test_chained_merges_compose(spark):
    """Merged symbols feed later merges: [b+c, a+bc] turns 'abc' into
    ONE token, and the pair ('a','bc') must match only the merged
    symbol, never raw adjacent chars."""
    merges = [("b", "c"), ("a", "bc")]
    got = _counts(spark, [(1, "abc"), (2, "acb")], merges)
    assert got[1] == 1
    assert got[2] == 3  # no pair applies


def test_witness_vocab_hand_computed(spark):
    """Hand-walked merge sequences under WITNESS_BPE_MERGES."""
    got = _counts(
        spark,
        [
            (1, "there"),   # th -> the -> +re = [the, re] -> 2
            (2, "thin"),    # [th, in] -> 2
            (3, "the cat sat on a mat"),
            # the=1; cat=[c,at]=2; sat=[s,at]=2; on=1; a=1; mat=[m,at]=2
            (4, "ERER"),    # lowercased: er er -> [er, er] -> 2
            (5, "xyz"),     # nothing applies -> 3
        ],
        WITNESS_BPE_MERGES,
    )
    assert got == {1: 2, 2: 2, 3: 9, 4: 2, 5: 3}


def test_overlap_left_to_right(spark):
    """Self-overlapping pair merges left-to-right non-overlapping:
    'aaa' with (a,a) -> [aa, a] -> 2; 'aaaa' -> [aa, aa] -> 1 after
    (aa,aa)? no such merge -> 2."""
    got = _counts(spark, [(1, "aaa"), (2, "aaaa")], [("a", "a")])
    assert got == {1: 2, 2: 2}


def test_null_empty_whitespace(spark):
    got = _counts(
        spark,
        [(1, None), (2, ""), (3, "   \t "), (4, " a  b ")],
        WITNESS_BPE_MERGES,
    )
    assert got == {1: None, 2: 0, 3: 0, 4: 2}


def test_matches_independent_reference_on_random_words(spark):
    """Engine vs the one-occurrence-at-a-time reference on seeded
    random strings over a vocab with chained + competing merges."""
    import random

    rng = random.Random(42)
    merges = [("a", "b"), ("b", "a"), ("ab", "a"), ("c", "c"),
              ("cc", "ab"), ("a", "a")]
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
             for _ in range(60)]
    rows = [(i, w) for i, w in enumerate(words)]
    got = _counts(spark, rows, merges)
    for i, w in enumerate(words):
        assert got[i] == _ref_bpe(w, merges), (w, got[i], _ref_bpe(w, merges))


def test_duckdb_replace_chain_equivalence(spark):
    """The oracle contract itself: on corpus-like text the engine
    equals DuckDB's rank-ordered sentinel replace() chain."""
    duckdb = pytest.importorskip("duckdb")
    texts = [
        "The rain in Spain stays mainly on the plain!",
        "internationalization and localization matter a lot",
        "Here, there, and everywhere... 123 cats ate rats.",
        "thththe thethe erer rere atat",
        "",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = _counts(spark, rows, WITNESS_BPE_MERGES)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = """
        SELECT doc_id,
               CAST(length(regexp_replace(
                 replace(replace(replace(replace(
                 replace(replace(replace(replace(
                   lower(text),
                   'th', chr(1)), chr(1) || 'e', chr(2)),
                   'in', chr(3)), 'er', chr(4)),
                   'an', chr(5)), 'on', chr(6)),
                   're', chr(7)), 'at', chr(8)),
                 '\\s', '', 'g')) AS BIGINT) AS bpe_tokens
        FROM docs
    """
    want = dict(con.execute(sql).fetchall())
    assert got == want


def test_memoization_repeated_words(spark):
    """One word repeated thousands of times in a batch: memo path
    returns identical counts (and doesn't blow up)."""
    text = " ".join(["there"] * 5000)
    got = _counts(spark, [(1, text)], WITNESS_BPE_MERGES)
    assert got[1] == 2 * 5000
