"""Quantitative pass criteria for the hash-specific (no-SQL-oracle)
ops: SimHash blocking recall vs brute-force hamming, MinHash-LSH
recall/precision on planted near-duplicates, ANN-LSH recall@k vs the
exact brute-force baseline, fingerprint determinism/robustness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from featuretools_spark.ops.dedup import (
    hamming_distance,
    minhash_duplicates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_duplicates,
)
from featuretools_spark.ops.similarity import brute_force_topk, lsh_topk
from featuretools_spark.ops.textstats import fingerprint

SF_DIR = "/root/testdata/sf0.001"

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _doc(i, mutate=None):
    """Deterministic 40-word document; mutate=j swaps word j."""
    words = [_WORDS[(i * 7 + j * 3) % len(_WORDS)] + str((i + j) % 9)
             for j in range(40)]
    if mutate is not None:
        words[mutate] = "zz" + words[mutate]
    return " ".join(words)


@pytest.fixture(scope="module")
def planted(spark):
    """120 distinct docs + 12 planted near-copies (1 word of 40
    changed -> shingle Jaccard ~0.9)."""
    rows = [(i, _doc(i)) for i in range(120)]
    rows += [(1000 + i, _doc(i, mutate=(i * 5) % 40)) for i in range(12)]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def test_simhash_blocking_recall_exact(spark, planted):
    """The pigeonhole fix: with max_hamming=h the blocking join must
    find EVERY pair whose exact 64-bit hamming distance is <= h —
    verified against the brute-force all-pairs distance."""
    for h in (3, 6):
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_near_duplicates(
                planted, "doc_id", "text", max_hamming=h
            ).collect()
        }
        sig = simhash64(planted, "doc_id", "text")
        a = sig.select(F.col("doc_id").alias("id_a"),
                       F.col("simhash").alias("sh_a"))
        b = sig.select(F.col("doc_id").alias("id_b"),
                       F.col("simhash").alias("sh_b"))
        brute = {
            (r["id_a"], r["id_b"])
            for r in a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(hamming_distance(F.col("sh_a"), F.col("sh_b")) <= h)
            .collect()
        }
        assert got == brute, f"hamming<={h}: blocking missed pairs"
        if h == 6:
            # the planted near-copies should mostly land within 6 bits
            planted_found = sum(1 for (x, y) in got if y == x + 1000)
            assert planted_found >= 8


def test_minhash_planted_recall_precision(spark, planted):
    pairs = minhash_duplicates(planted, "doc_id", "text", num_perm=64,
                               bands=16, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    planted_pairs = {(i, 1000 + i) for i in range(12)}
    found = planted_pairs & set(got)
    assert len(found) >= 11, f"recall {len(found)}/12"
    # precision: every reported pair must be a true near-dup (exact
    # 5-gram Jaccard >= 0.4)
    if got:
        cands = spark.createDataFrame(
            [(a, b) for a, b in got], "id_a int, id_b int"
        )
        exact = ngram_jaccard_pairs(planted, "doc_id", "text", k=5,
                                    threshold=0.0, candidates=cands)
        jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
        bad = [p for p in got if jac.get(p, 0.0) < 0.4]
        assert not bad, f"false positives: {bad[:5]}"
        # estimator quality on the found planted pairs
        for p in found:
            assert abs(got[p] - jac[p]) < 0.3


def test_ngram_jaccard_refuses_quadratic(spark, planted):
    with pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_pairs(planted, "doc_id", "text",
                            max_rows_all_pairs=10).collect()


def test_lsh_topk_recall_at_k(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    kw = dict(id_col="vec_id", vec_col="embedding", k=5)
    exact = brute_force_topk(corpus, queries, **kw).collect()
    approx = lsh_topk(corpus, queries, n_planes=12, **kw).collect()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = tot = 0
    for r in approx:
        tot += 0  # counted via truth below
        if r["vec_id"] in truth.get(r["query_id"], set()):
            hits += 1
    tot = sum(len(v) for v in truth.values())
    assert tot > 0
    recall = hits / tot
    assert recall >= 0.9, f"recall@5 = {recall:.2f}"


def test_fingerprint_determinism_and_robustness(spark):
    rows = [
        (1, "The quick  Brown fox\njumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog and then naps"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fp = {r["doc_id"]: r for r in fingerprint(df, "doc_id", "text").collect()}
    # whitespace + case normalization: 1 and 2 are identical
    assert fp[1]["exact_fp"] == fp[2]["exact_fp"]
    assert fp[1]["min_gram_fp"] == fp[2]["min_gram_fp"]
    # appending text can only widen the gram set: min never increases
    assert fp[3]["min_gram_fp"] <= fp[2]["min_gram_fp"]
    assert fp[3]["max_gram_fp"] >= fp[2]["max_gram_fp"]
    # prefix-sharing doc differs in exact fp
    assert fp[3]["exact_fp"] != fp[2]["exact_fp"]


def test_brute_force_topk_refuses_large_query_side(spark):
    """VERDICT r2 #7: the quadratic broadcast cross-join refuses an
    oversized query side, pointing at lsh_topk."""
    import pytest
    from pyspark.sql import functions as F

    from featuretools_spark.ops.similarity import brute_force_topk

    corpus = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(1), F.rand(2)).alias("embedding"))
    queries = spark.range(30).select(
        F.col("id").alias("query_id"),
        F.array(F.rand(3), F.rand(4)).alias("query_vec"))
    with pytest.raises(ValueError, match="lsh_topk"):
        brute_force_topk(corpus, queries, k=3, max_query_rows=10)
    out = brute_force_topk(corpus, queries, k=3, max_query_rows=100)
    assert out.count() == 90


def test_embedding_near_dup_lsh_recall(spark):
    """Planted high-cosine pairs (v + small noise, cos >= ~0.97) must
    be recovered by the random-hyperplane LSH path at >= 0.9 recall,
    with every reported pair verified exact (precision 1 by
    construction: the final filter is the true cosine)."""
    import numpy as np

    from featuretools_spark.ops.dedup import embedding_near_duplicates

    rng = np.random.RandomState(5)
    base = rng.randn(150, 32)
    near = base[:30] + 0.08 * rng.randn(30, 32)   # planted near-dups
    far = rng.randn(120, 32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(1000 + i, [float(x) for x in v]) for i, v in enumerate(near)]
    rows += [(5000 + i, [float(x) for x in v]) for i, v in enumerate(far)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.9, method="exact"
        ).collect()
    }
    assert len(exact) >= 25     # the planted pairs are really there
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.9, method="lsh",
            n_planes=10, n_tables=8,
        ).collect()
    }
    assert got <= exact          # precision 1: exact cosine re-check
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9"


def test_embedding_near_dup_exact_refuses_large(spark):
    df = spark.range(100).selectExpr(
        "id AS vec_id", "array(cast(id as double)) AS embedding")
    from featuretools_spark.ops.dedup import embedding_near_duplicates

    with pytest.raises(ValueError, match="quadratic"):
        embedding_near_duplicates(df, "vec_id", "embedding",
                                  method="exact", max_rows_exact=10)


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF with a k-means coarse quantizer: on clustered embeddings
    (the realistic shape — uniform-random vectors are IVF's worst
    case) recall@10 vs brute force must be >= 0.9, and the quantizer
    must be deterministic across runs."""
    import numpy as np

    from featuretools_spark.ops.similarity import (
        brute_force_topk, ivf_topk, kmeans_centroids,
    )

    rng = np.random.RandomState(8)
    centers = rng.randn(12, 16) * 4.0
    pts = np.concatenate(
        [c + rng.randn(60, 16) * 0.5 for c in centers])    # 720 rows
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    corpus = df.filter(F.col("vec_id") >= 24)
    qs = df.filter(F.col("vec_id") < 24).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(corpus, qs, k=10).collect()}
    got = {(r["query_id"], r["vec_id"])
           for r in ivf_topk(corpus, qs, k=10, n_clusters=12, n_probe=3,
                             max_iter=4).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9"

    c1 = kmeans_centroids(corpus, "embedding", 12, max_iter=2)
    c2 = kmeans_centroids(corpus, "embedding", 12, max_iter=2)
    # hash-seeded init is deterministic; F.avg partial-aggregation
    # order is not contractually so — compare with fp tolerance.
    assert np.allclose(np.array(c1), np.array(c2), rtol=1e-9, atol=1e-12)


def test_ivf_plan_size_constant_in_n_clusters(spark):
    """Centroids travel as a spark broadcast, not plan literals: the
    optimized plan of ivf_topk must stay O(1) even at n_clusters=1024
    x dim=64 (would be ~65k literal nodes in the old encoding)."""
    from featuretools_spark.ops.similarity import ivf_topk

    rng = np.random.RandomState(3)
    pts = rng.randn(200, 64)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    corpus = df.filter(F.col("vec_id") >= 8)
    qs = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    centroids = [[float(x) for x in row]
                 for row in rng.randn(1024, 64)]
    out = ivf_topk(corpus, qs, k=5, n_probe=4, centroids=centroids)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 50_000, f"plan blew up: {len(plan)} chars"
    assert out.limit(1).count() >= 0  # executes end-to-end


def test_duplicate_clusters_transitive_and_canonical(spark):
    """NEW r4: pair-graph cluster resolution. A~B, B~C (no A~C pair)
    must land in ONE cluster labeled min(id); keep_canonical keeps
    exactly one survivor per cluster and passes untouched rows
    through."""
    from featuretools_spark.ops.dedup import (
        duplicate_clusters, keep_canonical,
    )

    # components: {1,2,3} (chain), {10,11}, {20,21,22,23} (star on 20)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (20, 22), (20, 23)],
        "id_a int, id_b int")
    got = {r["id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}

    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 5, 10, 11, 20, 21, 22, 23, 99]],
        "doc_id int, text string")
    kept = sorted(r["doc_id"]
                  for r in keep_canonical(df, pairs, "doc_id").collect())
    # survivors: cluster minima 1, 10, 20 + untouched 5, 99
    assert kept == [1, 5, 10, 20, 99]

    # long chain through the DISTRIBUTED loop (max_edges_driver=0
    # forces it — the union-find fast path would hide it): pointer
    # jumping closes a 12-hop chain well inside default rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30, 42)], "id_a int, id_b int")
    got2 = {r["id"]: r["cluster_id"]
            for r in duplicate_clusters(
                chain, max_edges_driver=0).collect()}
    assert set(got2.values()) == {30}

    # distributed and driver union-find paths agree exactly
    got3 = {r["id"]: r["cluster_id"]
            for r in duplicate_clusters(chain).collect()}
    assert got3 == got2

    # non-convergence guard fires with tiny max_iter (distributed)
    import pytest as _pt
    with _pt.raises(RuntimeError, match="converge"):
        duplicate_clusters(chain, max_iter=2, max_edges_driver=0)
