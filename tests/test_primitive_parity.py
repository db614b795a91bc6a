"""Primitive parity vs pandas/numpy — the reference's kernels ARE
pandas ops, so pandas is the ground truth here (mirrors the
reference's per-primitive unit tests, tests/primitive_tests/)."""

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import featuretools_spark as fts
from featuretools_spark.features import (
    AggregationFeature,
    GroupByTransformFeature,
    IdentityFeature,
    TransformFeature,
)
from featuretools_spark.primitives import (
    get_aggregation_primitive,
    get_transform_primitive,
)
from featuretools_spark.primitives.base import TransformContext


@pytest.fixture(scope="module")
def small_pdf():
    rng = np.random.RandomState(7)
    n = 40
    return pd.DataFrame({
        "id": np.arange(n),
        "grp": rng.randint(0, 3, n),
        "val": np.where(rng.rand(n) < 0.15, np.nan,
                        np.round(rng.randn(n) * 10, 2)),
        "den": rng.randint(-2, 3, n).astype(float),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "flag": rng.rand(n) < 0.5,
        "cat": rng.choice(list("abc"), n),
    })


@pytest.fixture(scope="module")
def small_sdf(spark, small_pdf):
    return spark.createDataFrame(small_pdf).cache()


def _tf(spark, sdf, prim_name, cols, order=("ts", "id"), partition=None, **kw):
    prim = get_transform_primitive(prim_name)
    for k, v in kw.items():
        setattr(prim, k, v)
    ctx = TransformContext(
        time=F.col("ts"),
        order_cols=list(order),
        partition_cols=list(partition or []),
    )
    out = sdf.withColumn("_out", prim.expr([F.col(c) for c in cols], ctx))
    return {r["id"]: r["_out"] for r in out.select("id", "_out").collect()}


def _close(a, b, tol=1e-9):
    if a is None and (b is None or (isinstance(b, float) and math.isnan(b))):
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    if isinstance(a, (int, float)):
        fa, fb = float(a), float(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return abs(fa - fb) <= tol * max(1.0, abs(fb))
    return a == b


def test_weekday_week_parity(spark, small_sdf, small_pdf):
    got = _tf(spark, small_sdf, "weekday", ["ts"])
    want = small_pdf.set_index("id")["ts"].dt.weekday
    assert all(got[i] == want[i] for i in want.index)
    got_w = _tf(spark, small_sdf, "week", ["ts"])
    want_w = small_pdf.set_index("id")["ts"].dt.isocalendar().week
    assert all(got_w[i] == want_w[i] for i in want_w.index)


def test_modulo_python_semantics(spark, small_sdf, small_pdf):
    got = _tf(spark, small_sdf, "modulo_numeric", ["val", "den"])
    p = small_pdf.set_index("id")
    for i in p.index:
        v, d = p.loc[i, "val"], p.loc[i, "den"]
        if np.isnan(v):
            assert got[i] is None or math.isnan(got[i])
        elif d == 0:
            assert got[i] is None or math.isnan(got[i])
        else:
            assert _close(got[i], v % d), (i, got[i], v % d)


def test_divide_by_zero_inf(spark, small_sdf, small_pdf):
    got = _tf(spark, small_sdf, "divide_numeric", ["val", "den"])
    p = small_pdf.set_index("id")
    for i in p.index:
        v, d = p.loc[i, "val"], p.loc[i, "den"]
        if np.isnan(v):
            continue
        want = v / d if d != 0 else (
            np.inf if v > 0 else (-np.inf if v < 0 else np.nan)
        )
        if math.isnan(want):
            assert got[i] is None or math.isnan(got[i])
        else:
            assert _close(got[i], want), (i, got[i], want)


def test_cum_sum_nan_slots(spark, small_sdf, small_pdf):
    got = _tf(spark, small_sdf, "cum_sum", ["val"], partition=["grp"])
    p = small_pdf.sort_values(["ts", "id"])
    want = p.groupby("grp")["val"].cumsum()
    want.index = p["id"]
    for i in want.index:
        assert _close(got[i], want[i]), (i, got[i], want[i])


def test_percentile_pct_rank(spark, small_sdf, small_pdf):
    got = _tf(spark, small_sdf, "percentile", ["val"])
    want = small_pdf.set_index("id")["val"].rank(pct=True)
    for i in want.index:
        assert _close(got[i], want[i]), (i, got[i], want[i])


def test_rolling_mean_gap(spark, small_sdf, small_pdf):
    got = _tf(spark, small_sdf, "rolling_mean", ["val"], partition=["grp"],
              window_length=4, gap=1, min_periods=2)
    p = small_pdf.sort_values(["ts", "id"])
    def roll(s):
        return s.shift(1).rolling(4, min_periods=2).mean()
    want = p.groupby("grp")["val"].transform(roll)
    want.index = p["id"]
    # pandas counts NaN windows differently: min_periods in pandas counts
    # non-null; our impl counts non-null too (F.count) — compare directly
    for i in want.index:
        assert _close(got[i], want[i], 1e-9), (i, got[i], want[i])


def _agg_parity(spark, small_sdf, small_pdf, prim_name, col, pd_fn, tol=1e-9):
    es = fts.EntitySet("p")
    grps = small_sdf.select(F.col("grp")).distinct()
    es.add_dataframe("grps", grps, index="grp")
    es.add_dataframe("rows", small_sdf, index="id", time_index="ts")
    es.add_relationship("grps", "grp", "rows", "grp")
    feat = AggregationFeature(
        IdentityFeature(es, "rows", col), "grps", prim_name, es=es
    )
    fm = fts.calculate_feature_matrix(
        [feat], es, cutoff_time=dt.datetime(2025, 1, 1)
    )
    got = {r["grp"]: r[feat.get_name()] for r in fm.collect()}
    for g, sub in small_pdf.groupby("grp"):
        want = pd_fn(sub)
        assert _close(got[g], want, tol), (prim_name, g, got[g], want)


def test_agg_std_ddof0(spark, small_sdf, small_pdf):
    _agg_parity(spark, small_sdf, small_pdf, "std", "val",
                lambda s: np.nanstd(s["val"].values))


def test_agg_skew_pandas(spark, small_sdf, small_pdf):
    _agg_parity(spark, small_sdf, small_pdf, "skew", "val",
                lambda s: s["val"].skew(), tol=1e-7)


def test_agg_kurtosis_pandas(spark, small_sdf, small_pdf):
    _agg_parity(spark, small_sdf, small_pdf, "kurtosis", "val",
                lambda s: s["val"].kurt(), tol=1e-7)


def test_agg_median_mode(spark, small_sdf, small_pdf):
    _agg_parity(spark, small_sdf, small_pdf, "median", "val",
                lambda s: s["val"].median())
    _agg_parity(spark, small_sdf, small_pdf, "mode", "cat",
                lambda s: s["cat"].mode().iloc[0])


def test_agg_entropy_scipy(spark, small_sdf, small_pdf):
    def ent(s):
        c = s["cat"].value_counts().values.astype(float)
        p = c / c.sum()
        return float(-(p * np.log(p)).sum())
    _agg_parity(spark, small_sdf, small_pdf, "entropy", "cat", ent, tol=1e-9)


def test_agg_trend_ols(spark, small_sdf, small_pdf):
    """reference calculate_trend (utils/time_utils.py:111-139): dropna,
    NaN for n<=2, 0 when all x equal, x scaled by the unit dividend of
    the first valid timestamp."""
    def trend(s):
        ok = s["val"].notna() & s["ts"].notna()
        if ok.sum() <= 2:
            return None
        xs = s.loc[ok, "ts"].astype("int64").values / 1e9  # seconds
        y = s.loc[ok, "val"].values
        first = int(xs[0])
        div = next((d for d in (86400, 3600, 60) if first % d == 0), 1)
        x = xs / div
        if len(np.unique(x)) == 1:
            return 0.0
        return float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
    _agg_parity(spark, small_sdf, small_pdf, "trend", "val", trend, tol=1e-6)


def test_agg_consecutive_and_peaks(spark, small_sdf, small_pdf):
    def max_consec_true(s):
        s2 = s.sort_values(["ts", "id"])["flag"].fillna(False)
        best = cur = 0
        for v in s2:
            cur = cur + 1 if v else 0
            best = max(best, cur)
        return float(best) if best else None
    _agg_parity(spark, small_sdf, small_pdf, "max_consecutive_true", "flag",
                max_consec_true)

    def n_peaks(s):
        v = s.sort_values(["ts", "id"])["val"].values
        n = 0
        for i in range(1, len(v) - 1):
            if not (np.isnan(v[i - 1]) or np.isnan(v[i]) or np.isnan(v[i + 1])):
                if v[i] > v[i - 1] and v[i] > v[i + 1]:
                    n += 1
        return n
    # our num_peaks uses lag/lead over nulls-last ordering; NaN neighbors
    # make the comparison null → not counted, same as the loop above
    _agg_parity(spark, small_sdf, small_pdf, "num_peaks", "val", n_peaks)
