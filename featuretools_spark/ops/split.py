"""Deterministic hash-based corpus splitting and sampling.

Training pipelines need splits and sampling that are a pure function
of the ROW KEY, not of partitioning, cluster size, or a run seed:
train/val/test membership must survive reprocessing, incremental
appends, and engine changes (Spark's df.sample / sampleBy are
seed+partition dependent, so a re-run on different parallelism moves
rows between splits — unusable as a durable split at 100 TB).

Everything here assigns u(key) = hash(key || "|" || seed) scaled to
[0, 1) with pure JVM expressions — zero shuffle, whole-stage codegen,
trivially parallel at any scale. Two hash modes, the repo's standard
pair (see ops/textstats.fingerprint):

- hash_fn="xxhash64" (default): 63-bit hash / 2^63 — the production
  path (cheap long hash, fine-grained u).
- hash_fn="md5": first 8 md5 hex digits / 2^32 — every u is
  integer/2^32, EXACT in double, so any SQL engine replays split
  membership bit-for-bit including the boundary comparisons (the
  driver's DuckDB oracle does).

Properties real pipelines rely on, pinned by tests:
- splits are disjoint + exhaustive and key-deterministic;
- sample_by_hash fractions NEST: the 10% sample is a subset of the
  50% sample at the same seed (u < f is monotone in f), so a curve
  of data-scale ablations shares rows by construction;
- changing the seed re-deals everything.

No reference analog: featuretools has no sampling surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO32 = 4294967296.0
_TWO63 = float(1 << 63)


def unit_hash(key_col, seed: str = "", hash_fn: str = "xxhash64"):
    """u(key) in [0, 1): deterministic, key+seed-only."""
    s = F.concat(key_col.cast("string"), F.lit("|" + seed))
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(F.encode(s, "UTF-8")), 1, 8), 16, 10
        ).cast("double") / F.lit(_TWO32)
    if hash_fn == "xxhash64":
        return (F.shiftrightunsigned(F.xxhash64(s), 1).cast("double")
                / F.lit(_TWO63))
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def hash_split(
    df: DataFrame, id_col: str, fractions, *, seed: str = "",
    hash_fn: str = "xxhash64", out_col: str = "split",
) -> DataFrame:
    """Append a split label chosen by u(id): ``fractions`` is an
    ordered [(name, fraction), ...] summing to 1 (±1e-9); row goes to
    the first bucket whose cumulative boundary exceeds u. The last
    bucket absorbs the boundary tail so the split is exhaustive."""
    fracs = list(fractions)
    if not fracs or any(f < 0 for _, f in fracs):
        raise ValueError("fractions must be non-negative")
    total = sum(f for _, f in fracs)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must sum to 1 (got {total}); for a partial "
            "sample use sample_by_hash")
    u = unit_hash(F.col(id_col), seed, hash_fn)
    expr = F.lit(fracs[-1][0])  # tail catcher
    cum = 0.0
    conds = []
    for name, f in fracs[:-1]:
        cum += f
        conds.append((name, cum))
    for name, boundary in reversed(conds):
        expr = F.when(u < F.lit(boundary), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def sample_by_hash(
    df: DataFrame, id_col: str, fraction: float, *, seed: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep rows with u(id) < fraction. Nesting: at a fixed seed the
    f1 sample is a subset of the f2 sample whenever f1 <= f2."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(
        unit_hash(F.col(id_col), seed, hash_fn) < F.lit(float(fraction)))


def stratified_sample_by_hash(
    df: DataFrame, id_col: str, strata_col: str, fractions: dict, *,
    default: float = 0.0, seed: str = "", hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic rates (the mixture-weights op: e.g.
    {"web": 0.3, "code": 1.0, "wiki": 1.0}). Unknown strata keep
    ``default``. Same u(id) for every stratum, so raising one
    stratum's rate only ADDS rows — mixture reweighing between runs
    stays incremental."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError("default must be in [0, 1]")
    rate = F.lit(float(default))
    for k, v in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == F.lit(k),
                      F.lit(float(v))).otherwise(rate)
    return df.filter(unit_hash(F.col(id_col), seed, hash_fn) < rate)
