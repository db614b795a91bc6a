"""Concat-and-slice sequence packing (ops/pack.py).

No reference analog — featuretools has no batch-construction
surface; the contract is the GPT-style pack: concatenate streams in
id order, slice every `capacity` positions.
"""
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from featuretools_spark.ops.pack import pack_causal_chunks


def _ref(rows, C):
    """Single-node reference: walk docs in id order, place greedily."""
    out = []
    start = 0
    for doc_id, ln in sorted(rows):
        if ln > 0:
            for c in range(start // C, (start + ln - 1) // C + 1):
                f = max(0, c * C - start)
                t = min(ln, (c + 1) * C - start)
                out.append((doc_id, c, f, t, start + f - c * C))
            start += ln
    return sorted(out)


def _got(spark, rows, C, parts=1):
    df = spark.createDataFrame(rows, ["doc_id", "n"]).repartition(parts)
    res = pack_causal_chunks(df, "doc_id", "n", C)
    return sorted(
        (r["doc_id"], r["chunk_id"], r["tok_from"], r["tok_to"],
         r["chunk_pos"]) for r in res.collect())


def test_matches_reference_incl_zero_and_oversize(spark):
    rows = [(1, 3), (2, 0), (3, 10), (4, 1), (5, 7)]  # C=4: doc 3 spans 3 chunks
    assert _got(spark, rows, 4) == _ref(rows, 4)


def test_fuzz_and_partitioning_invariance(spark):
    rng = random.Random(11)
    rows = [(i, rng.choice([0, 1, 2, 5, 17, 64, 200]))
            for i in range(300)]
    want = _ref(rows, 32)
    assert _got(spark, rows, 32, parts=1) == want
    assert _got(spark, rows, 32, parts=17) == want  # layout-invariant


def test_chunks_tile_the_stream_exactly(spark):
    rng = random.Random(5)
    rows = [(i, rng.randint(0, 50)) for i in range(200)]
    C = 64
    placed = _got(spark, rows, C)
    total = sum(n for _, n in rows)
    # coverage: per-doc slices are contiguous and total the doc length
    per_doc = {}
    for doc_id, c, f, t, pos in placed:
        per_doc.setdefault(doc_id, []).append((f, t))
    for doc_id, ln in rows:
        if ln == 0:
            assert doc_id not in per_doc
            continue
        ivs = sorted(per_doc[doc_id])
        assert ivs[0][0] == 0 and ivs[-1][1] == ln
        assert all(a[1] == b[0] for a, b in zip(ivs, ivs[1:]))
    # tiling: every chunk except the last holds exactly C positions,
    # starting at chunk_pos runs that abut
    by_chunk = {}
    for doc_id, c, f, t, pos in placed:
        by_chunk.setdefault(c, []).append((pos, pos + (t - f)))
    last = max(by_chunk)
    for c, spans in by_chunk.items():
        spans.sort()
        assert spans[0][0] == 0
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
        filled = spans[-1][1]
        assert filled == (C if c != last else total - last * C)


def test_matches_duckdb_window_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(3)
    rows = [(i, rng.randint(0, 120)) for i in range(400)]
    got = _got(spark, rows, 100)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "n"]))
    want = sorted(con.execute("""
        WITH s AS (
            SELECT doc_id, n,
                   CAST(sum(n) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n
                        AS BIGINT) AS st
            FROM docs
        )
        SELECT doc_id, c AS chunk_id,
               greatest(0, c * 100 - st) AS tok_from,
               least(n, (c + 1) * 100 - st) AS tok_to,
               st + greatest(0, c * 100 - st) - c * 100 AS chunk_pos
        FROM s, unnest(generate_series(st // 100,
                                       (st + n - 1) // 100)) AS t(c)
        WHERE n > 0
    """).fetchall())
    assert got == want


def test_capacity_validation(spark):
    df = spark.createDataFrame([(1, 2)], ["doc_id", "n"])
    with pytest.raises(ValueError, match="capacity"):
        pack_causal_chunks(df, "doc_id", "n", 0)
