"""Deterministic sf0.1 -> sf1 scale-up for the round-6 scale gate
(VERDICT r5 next-round #5: run the full oracle gate at 10x the
driver's bench SF to catch scale-dependent wrongness — int overflow
in witnesses, LSH band sampling skew, quantizer degeneracy).

NOT driver data — a deterministic 10-fold tiling of the driver's own
sf0.1 tables (seeded by tile index only), written to /tmp/sf1. The
gate compares the ENGINE vs DuckDB on the SAME tiled input, so the
comparison is valid regardless of the tiling; what the bigger input
exercises is the engine's hash/sketch/quantizer paths at 10x
cardinality.

Tiling rules (referential integrity preserved):
- region/nation: fixed dimensions, copied once (TPC-H does not scale
  them either).
- customer/supplier/part/orders/lineitem/events/documents/embeddings:
  10 tiles; every key column k becomes k + tile * K_STRIDE(table),
  stride = 10^ceil(log10(max_key+1)) so tiled key ranges never
  collide and key arithmetic (e.g. ngram_jaccard's doc_id+1 chain)
  stays within a tile except at its single boundary row.
- documents.text: per-tile Caesar cipher over [a-z]/[A-Z] (rot by
  7*tile). A bijective character substitution preserves every
  WITHIN-tile shingle-Jaccard exactly (the witness-oracle margins of
  ADVICE r5 #4 hold tile-by-tile) while cross-tile letter shingles
  share only digit/punctuation shingles -> cross-tile J ~ 0, far
  below the 0.45 margin bound.
- embeddings.embedding: per-tile deterministic sign-flip pattern
  (element-wise multiply by s in {-1,+1}^dim, seed=tile). Sign flips
  preserve all WITHIN-tile cosines and norms exactly; cross-tile
  cos(u, s*u) = sum(s_i u_i^2)/|u|^2, a +-1-weighted sum that
  concentrates near 0 — no spurious cross-tile near-dups.

Usage: python tools/make_sf1.py [--tiles 10] [--out /tmp/sf1]
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _stride(maxval: int) -> int:
    return 10 ** int(math.ceil(math.log10(maxval + 2)))


def _cipher_arr(texts: pa.ChunkedArray, rot: int) -> pa.Array:
    """Vectorized per-tile Caesar cipher via bytes translation."""
    lo = bytes(range(ord("a"), ord("z") + 1))
    up = bytes(range(ord("A"), ord("Z") + 1))
    table = bytes.maketrans(
        lo + up,
        bytes((b - ord("a") + rot) % 26 + ord("a") for b in lo)
        + bytes((b - ord("A") + rot) % 26 + ord("A") for b in up),
    )
    return pa.array(
        [None if t is None else t.translate(table)
         for t in texts.to_pylist()],
        type=pa.string(),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for t in ("region", "nation"):
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl, f"{args.out}/{t}.parquet")
        print(t, tbl.num_rows, "(copied)")

    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    # strides must agree between the table owning a key and every
    # table referencing it
    strides: dict[str, int] = {}
    tables = {t: pq.read_table(f"{SRC}/{t}.parquet") for t in key_cols}
    for t, cols in key_cols.items():
        for c in cols:
            mx = int(pa.compute.max(tables[t][c]).as_py())
            strides[c] = max(strides.get(c, 0), _stride(mx))
    # shared key spaces: o_custkey <- c_custkey, l_orderkey <-
    # o_orderkey, l_partkey <- p_partkey, l_suppkey <- s_suppkey,
    # user_id <- c_custkey (events reference customers in the
    # entityset queries)
    alias = {"o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
             "l_partkey": "p_partkey", "l_suppkey": "s_suppkey",
             "user_id": "c_custkey"}
    for a, b in alias.items():
        s = max(strides[a], strides[b])
        strides[a] = strides[b] = s

    rng_dim = None
    for t, cols in key_cols.items():
        src = tables[t]
        parts = []
        for tile in range(args.tiles):
            cols_out = {}
            for name in src.column_names:
                col = src[name]
                if name in cols:
                    cols_out[name] = pa.compute.add(
                        col, tile * strides[name])
                elif t == "documents" and name == "text":
                    cols_out[name] = (col.combine_chunks()
                                      if tile == 0 else
                                      _cipher_arr(col, (7 * tile) % 26))
                elif t == "embeddings" and name == "embedding":
                    if rng_dim is None:
                        rng_dim = len(col[0].as_py())
                    if tile == 0:
                        cols_out[name] = col
                    else:
                        sign = np.where(
                            np.random.default_rng(tile)
                            .random(rng_dim) < 0.5, -1.0, 1.0
                        ).astype(np.float32)
                        flat = np.asarray(
                            col.combine_chunks().flatten(),
                            dtype=np.float32,
                        ).reshape(-1, rng_dim) * sign
                        cols_out[name] = pa.FixedSizeListArray.from_arrays(
                            pa.array(flat.ravel(), type=pa.float32()),
                            rng_dim,
                        ).cast(pa.list_(pa.float32()))
                else:
                    cols_out[name] = col
            parts.append(pa.table(
                {n: cols_out[n] for n in src.column_names}))
        out = pa.concat_tables(parts)
        # small row groups so Spark's file-split logic can parallelize
        # the scan: a single default-row-group file packs 50k docs
        # into ~2 x 128MB splits and caps scan parallelism at 2 tasks
        # (measured in BENCH/curation_ops_timing_r6.json's sf1 legs)
        pq.write_table(out, f"{args.out}/{t}.parquet",
                       row_group_size=max(out.num_rows // 32, 1024))
        print(t, src.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    main()
