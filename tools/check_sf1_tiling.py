"""sf1 correctness for the four quadratic-witness queries (round 6).

The DuckDB witness oracles for minhash_dedup / simhash_dedup /
embedding_dedup / dedup_clusters compute the TRUE near-dup pair set —
inherently O(n^2) — so at sf1 (50k docs -> 1.25e9 pairs of ~150-item
list intersections) the SQL oracle is intractable BY DESIGN, not by
engine limitation. This checker closes the sf1 gap with methods that
stay exact where exactness is tractable:

embedding_dedup / dedup_clusters (20k x 64 vectors): the full truth
IS tractable outside SQL — one blocked numpy float64 GEMM gives all
2e8 cosines exactly. Complete check: engine pair set == GEMM pair
set (both directions), scores equal at round-4; clusters compared
against union-find over the GEMM edge set with the same min-label
semantics as the DuckDB recursive CTE.

(Since round 6 the simhash leg is ADVISORY: this checker's tile flips
are what demonstrated the hamming-margin sensitivity, and the
simhash_dedup oracle was converted to an exact md5-witness that IS
tractable at sf1 — see the main() comment.)

minhash_dedup / simhash_dedup (50k docs): /tmp/sf1 is tools/
make_sf1.py's 10-tile construction — tile t's text is a per-tile
Caesar cipher (bijective char substitution), so every WITHIN-tile
shingle-Jaccard equals the sf0.1 original exactly, while cross-tile
letter shingles diverge. Checks:
  (a) tile-invariance: the within-tile restriction of the sf1 engine
      output, mapped back to base keys, must equal the sf0.1 engine
      output EXACTLY for each of the 10 tiles. The sf0.1 output is
      itself full-oracle-checked (all-pairs DuckDB witness at sf0.1,
      this round) — so each tile inherits that witness. Tiles 1-9 run
      the engine's hash/band/bucket machinery over nine
      hash-perturbed corpora: a per-tile LSH recall failure would
      break equality and be reported.
  (b) emitted cross-tile pairs are re-scored exactly in python (must
      be genuine >= threshold pairs).
  (c) cross-tile completeness is SAMPLED (default 1M random
      cross-tile pairs, exact python Jaccard): the construction
      predicts J << 0.5; the observed max and its margin to the 0.5
      threshold are reported. This is the one non-exhaustive leg —
      stated as such in the report.

Usage: python tools/check_sf1_tiling.py [--sf1 /tmp/sf1]
    [--sf01 /root/testdata/sf0.1] [--samples 1000000]
    [--out BENCH/sf1_quad_witness_r6.json]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _r4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _stride(maxval: int) -> int:
    return 10 ** math.ceil(math.log10(maxval + 1))


def _shingles(text: str, k: int) -> set:
    t = text.lower()
    n = max(len(t) - (k - 1), 1)
    return {t[i:i + k] for i in range(n)}


def _jaccard(a: set, b: set) -> float:
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def check_text_query(name, qfn, spark, sf1, sf01, k, threshold, samples,
                     rng):
    import duckdb
    rep = {"kind": "tile-invariance + exact cross re-score + sampled "
                   "cross completeness", "shingle_k": k}
    r01 = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in qfn(spark, sf01).collect()}
    r1 = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in qfn(spark, sf1).collect()}
    con = duckdb.connect()
    max01 = con.execute(
        f"SELECT max(doc_id) FROM '{sf01}/documents.parquet'").fetchone()[0]
    stride = _stride(int(max01))
    rep["pairs_sf01"] = len(r01)
    rep["pairs_sf1"] = len(r1)
    rep["stride"] = stride

    # (a) per-tile equality against the (oracle-checked) sf0.1 output
    tiles = {}
    cross = {}
    for (a, b), j in r1.items():
        ta, tb = a // stride, b // stride
        if ta == tb:
            tiles.setdefault(ta, {})[(a - ta * stride, b - tb * stride)] = j
        else:
            cross[(a, b)] = j
    tile_report = {}
    ok = True
    for t in range(10):
        got = tiles.get(t, {})
        missing = [p for p in r01 if p not in got]
        extra = [p for p in got if p not in r01]
        jdiff = sum(1 for p, j in got.items()
                    if p in r01 and abs(j - r01[p]) > 0)
        tile_report[str(t)] = {"pairs": len(got), "missing": len(missing),
                               "extra": len(extra), "score_mismatch": jdiff}
        ok &= not missing and not extra and not jdiff
    rep["tiles"] = tile_report
    rep["tile_invariance_ok"] = ok

    # (b) exact python re-score of every emitted cross-tile pair
    docs = {r[0]: r[1] for r in con.execute(
        f"SELECT doc_id, text FROM '{sf1}/documents.parquet'").fetchall()}
    bad_cross = []
    for (a, b), j in cross.items():
        jt = _r4(_jaccard(_shingles(docs[a], k), _shingles(docs[b], k)))
        if jt < threshold or abs(jt - j) > 0:
            bad_cross.append([a, b, j, jt])
    rep["cross_tile_pairs_emitted"] = len(cross)
    rep["cross_tile_pairs_wrong"] = bad_cross

    # (c) sampled cross-tile completeness: exact J of random cross
    # pairs — the construction predicts a wide margin below threshold
    ids = sorted(docs)
    sh = {i: frozenset(_shingles(docs[i], k)) for i in ids}
    worst = 0.0
    found_missed = 0
    for _ in range(samples):
        a, b = rng.choice(ids), rng.choice(ids)
        if a // stride == b // stride:
            continue
        j = _jaccard(sh[a], sh[b])
        worst = max(worst, j)
        if j >= threshold and (min(a, b), max(a, b)) not in cross:
            found_missed += 1
    rep["cross_sample_n"] = samples
    rep["cross_sample_worst_j"] = round(worst, 4)
    rep["cross_sample_missed_pairs"] = found_missed
    rep["ok"] = ok and not bad_cross and not found_missed
    return rep


def _true_cosine_pairs(emb_path, threshold):
    """Exact all-pairs cosine via blocked float64 GEMM."""
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{emb_path}' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    n = len(ids)
    out = {}
    B = 2048
    for s in range(0, n, B):
        S = X[s:s + B] @ X.T                      # (B, n) float64 GEMM
        ii, jj = np.nonzero(S >= threshold)
        for bi, j in zip(ii, jj):
            i = s + bi
            if ids[i] < ids[j]:
                out[(int(ids[i]), int(ids[j]))] = _r4(float(S[bi, j]))
    return out


def check_embedding(name, qfn, spark, sf1, threshold):
    rep = {"kind": "complete exact numpy GEMM witness"}
    truth = _true_cosine_pairs(f"{sf1}/embeddings.parquet", threshold)
    got = {(r["id_a"], r["id_b"]): r["cos"]
           for r in qfn(spark, sf1).collect()}
    missing = [p for p in truth if p not in got]
    extra = [p for p in got if p not in truth]
    score = [p for p in truth if p in got and abs(truth[p] - got[p]) > 0]
    rep.update({"true_pairs": len(truth), "engine_pairs": len(got),
                "missing": len(missing), "extra": len(extra),
                "score_mismatch": len(score),
                "ok": not missing and not extra and not score})
    return rep, truth


def check_clusters(name, qfn, spark, sf1, truth):
    rep = {"kind": "union-find over the exact GEMM edge set, min-label"}
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in truth:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {r["id"]: r["cluster_id"] for r in qfn(spark, sf1).collect()}
    wrong = [x for x in want if got.get(x) != want[x]]
    extra = [x for x in got if x not in want]
    rep.update({"true_ids": len(want), "engine_ids": len(got),
                "wrong_label": len(wrong), "extra_ids": len(extra),
                "ok": not wrong and not extra})
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--samples", type=int, default=1_000_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from featuretools_spark.session import get_spark

    spark = get_spark("sf1_tiling", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    rng = random.Random(7)

    report = {"metric": "sf1_quad_witness", "sf1": args.sf1,
              "sf01": args.sf01, "queries": {}}
    report["queries"]["minhash_dedup"] = check_text_query(
        "minhash_dedup", qs["minhash_dedup"], spark, args.sf1, args.sf01,
        k=5, threshold=0.5, samples=args.samples, rng=rng)
    print(json.dumps({"minhash_dedup":
                      report["queries"]["minhash_dedup"]}), flush=True)
    # simhash is ADVISORY here since round 6: its output contract is
    # {hamming<=10} INTERSECT {J>=0.5}, which legitimately varies
    # across hash-perturbed tiles (per-tile token hashes differ), and
    # its sf1 correctness is checked directly by the exact md5-witness
    # oracle (check_oracle.py, tractable at sf1). The tile flips this
    # leg measures are the margin-sensitivity evidence that forced
    # that oracle conversion — kept as a report, not a gate.
    sim = check_text_query(
        "simhash_dedup", qs["simhash_dedup"], spark, args.sf1, args.sf01,
        k=7, threshold=0.5, samples=args.samples, rng=rng)
    sim["advisory"] = ("hamming-margin sensitivity probe only; "
                       "pass/fail lives in the md5-witness oracle")
    sim["ok"] = True
    report["queries"]["simhash_dedup"] = sim
    print(json.dumps({"simhash_dedup": sim}), flush=True)
    emb_rep, truth = check_embedding(
        "embedding_dedup", qs["embedding_dedup"], spark, args.sf1, 0.35)
    report["queries"]["embedding_dedup"] = emb_rep
    print(json.dumps({"embedding_dedup": emb_rep}), flush=True)
    report["queries"]["dedup_clusters"] = check_clusters(
        "dedup_clusters", qs["dedup_clusters"], spark, args.sf1, truth)
    print(json.dumps({"dedup_clusters":
                      report["queries"]["dedup_clusters"]}), flush=True)

    report["ok"] = all(q["ok"] for q in report["queries"].values())
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
