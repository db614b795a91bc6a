"""encode_features + feature-selection post-ops.

Reference: synthesis/encode_features.py:13-194 (one-hot top-n
categories + unknown bucket) and selection/selection.py:5-140
(remove_low_information / highly_null / single_value /
highly_correlated). All pure DataFrame ops: category frequencies are
ONE groupBy per column (top-n via count + row_number window), the
one-hot expansion is F.when columns (no pivot shuffle), and the
selection stats run in ONE aggregate pass over the matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _qcol(name: str):
    return F.col(f"`{name}`")


def encode_features(
    feature_matrix: DataFrame,
    features: list[str] | None = None,
    top_n: int = 10,
    include_unknown: bool = True,
    drop_first: bool = False,
) -> DataFrame:
    """One-hot encode categorical (string) columns into
    `col = value` 0/1 columns for the top_n most frequent values
    (ties: smaller value first), plus `col is unknown`."""
    if features is None:
        features = [
            f.name for f in feature_matrix.schema.fields
            if f.dataType.typeName() == "string"
        ]
    out = feature_matrix
    for col in features:
        counts = (
            feature_matrix.filter(_qcol(col).isNotNull())
            .groupBy(_qcol(col).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = W.partitionBy().orderBy(F.desc("_c"), F.asc("_v"))
        top = [
            r["_v"]
            for r in counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_n)
            .collect()
        ]
        if drop_first:
            top = top[1:]
        for v in top:
            out = out.withColumn(
                f"{col} = {v}", (_qcol(col) == v).cast("int")
            )
        if include_unknown:
            out = out.withColumn(
                f"{col} is unknown",
                (~_qcol(col).isin(top) | _qcol(col).isNull()).cast("int"),
            )
        out = out.drop(col)
    return out


def _numeric_cols(df: DataFrame, exclude: set | None = None) -> list[str]:
    exclude = exclude or set()
    num = ("byte", "short", "integer", "long", "float", "double", "decimal")
    return [
        f.name for f in df.schema.fields
        if f.dataType.typeName() in num and f.name not in exclude
    ]


def remove_highly_null_features(
    feature_matrix: DataFrame, pct_null_threshold: float = 0.95,
    keys: list[str] | None = None,
) -> DataFrame:
    """Drop columns whose null fraction >= threshold (reference
    selection.py:31). One aggregate pass for every column."""
    keys = set(keys or [])
    cols = [c for c in feature_matrix.columns if c not in keys]
    stats = feature_matrix.agg(
        *[
            (F.count(F.when(_qcol(c).isNull(), 1)) / F.count(F.lit(1))).alias(c)
            for c in cols
        ]
    ).collect()[0]
    drop = [c for c in cols if (stats[c] or 0.0) >= pct_null_threshold]
    return feature_matrix.drop(*drop)


def remove_single_value_features(
    feature_matrix: DataFrame, count_nan_as_value: bool = False,
    keys: list[str] | None = None,
) -> DataFrame:
    """Drop columns with <= 1 distinct value (reference selection.py:70)."""
    keys = set(keys or [])
    cols = [c for c in feature_matrix.columns if c not in keys]
    aggs = []
    for c in cols:
        d = F.count_distinct(_qcol(c))
        if count_nan_as_value:
            d = d + F.max(F.when(_qcol(c).isNull(), 1).otherwise(0))
        aggs.append(d.alias(c))
    stats = feature_matrix.agg(*aggs).collect()[0]
    drop = [c for c in cols if (stats[c] or 0) <= 1]
    return feature_matrix.drop(*drop)


def remove_low_information_features(
    feature_matrix: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Drop columns that are all-null or single-valued (reference
    selection.py:5 combines both conditions)."""
    keys = set(keys or [])
    cols = [c for c in feature_matrix.columns if c not in keys]
    stats = feature_matrix.agg(
        *(
            [F.count_distinct(_qcol(c)).alias(f"d_{i}") for i, c in enumerate(cols)]
            + [F.count(_qcol(c)).alias(f"n_{i}") for i, c in enumerate(cols)]
        )
    ).collect()[0]
    drop = [
        c for i, c in enumerate(cols)
        if (stats[f"d_{i}"] or 0) <= 1 or (stats[f"n_{i}"] or 0) == 0
    ]
    return feature_matrix.drop(*drop)


def remove_highly_correlated_features(
    feature_matrix: DataFrame, pct_corr_threshold: float = 0.95,
    keys: list[str] | None = None,
) -> DataFrame:
    """Drop the LATER column of each numeric pair with
    |corr| >= threshold (reference selection.py:102 keeps the earlier
    feature). Pairwise F.corr in one aggregate pass."""
    keys = set(keys or [])
    cols = _numeric_cols(feature_matrix, exclude=keys)
    if len(cols) < 2:
        return feature_matrix
    pairs = [
        (i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))
    ]
    aggs = [
        F.corr(_qcol(cols[i]).cast("double"), _qcol(cols[j]).cast("double"))
        .alias(f"c_{i}_{j}")
        for i, j in pairs
    ]
    stats = feature_matrix.agg(*aggs).collect()[0]
    drop = set()
    for i, j in pairs:
        if cols[i] in drop or cols[j] in drop:
            continue
        c = stats[f"c_{i}_{j}"]
        if c is not None and abs(c) >= pct_corr_threshold:
            drop.add(cols[j])
    return feature_matrix.drop(*drop)
