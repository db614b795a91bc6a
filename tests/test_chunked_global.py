"""Halo-chunked evaluation of bounded-window pandas kernels over a
global ordering: must equal the single-frame evaluation exactly —
including partitions shorter than the halo."""

import numpy as np
import pandas as pd
import pytest

from featuretools_spark.chunked import bounded_window_global
from featuretools_spark.primitives.transform import RollingOutlierCount


def _single_frame(prim, pdf, in_cols, out_col, order_cols):
    full = pdf.sort_values(order_cols, kind="stable").copy()
    return prim.pandas(full, in_cols, out_col, order_cols)[out_col].to_numpy()


@pytest.mark.parametrize("window,gap", [(5, 0), (9, 3), (25, 0)])
def test_rolling_outlier_count_chunked_parity(spark, window, gap):
    rng = np.random.RandomState(11)
    n = 5000
    pdf = pd.DataFrame({"id": np.arange(n), "x": rng.randn(n)})
    pdf.loc[rng.rand(n) < 0.03, "x"] = np.nan
    pdf.loc[rng.rand(n) < 0.02, "x"] = 40.0      # planted outliers
    prim = RollingOutlierCount(window_length=window, gap=gap,
                               min_periods=1)
    df = spark.createDataFrame(pdf)
    out = (
        bounded_window_global(df, prim, ["x"], "y", ["id"],
                              *prim.halo(), num_partitions=16)
        .orderBy("id").toPandas()
    )
    exp = _single_frame(prim, pdf, ["x"], "y", ["id"])
    assert np.allclose(out["y"].to_numpy(), exp, equal_nan=True)


def test_chunked_more_partitions_than_rows(spark):
    """Halo wider than every partition: the cumulative tail walk must
    still assemble the right neighbourhood."""
    pdf = pd.DataFrame({"id": np.arange(40), "x": np.arange(40, dtype=float)})
    prim = RollingOutlierCount(window_length=30, gap=0, min_periods=1)
    df = spark.createDataFrame(pdf)
    out = (
        bounded_window_global(df, prim, ["x"], "y", ["id"],
                              *prim.halo(), num_partitions=16)
        .orderBy("id").toPandas()
    )
    exp = _single_frame(prim, pdf, ["x"], "y", ["id"])
    assert np.allclose(out["y"].to_numpy(), exp, equal_nan=True)


def test_centered_halo_parity(spark):
    """A centered kernel (savgol's shape, scipy-free stand-in: centered
    rolling mean) through the (before, after) halo plumbing."""

    class CenteredMean:
        name = "centered_mean"
        window_length = 7

        def halo(self):
            return (3, 3)

        def pandas(self, pdf, in_cols, out_col, order_cols):
            pdf[out_col] = (
                pdf[in_cols[0]].rolling(7, center=True, min_periods=1).mean()
            )
            return pdf

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({"id": np.arange(3000), "x": rng.randn(3000)})
    prim = CenteredMean()
    df = spark.createDataFrame(pdf)
    out = (
        bounded_window_global(df, prim, ["x"], "y", ["id"], 3, 3,
                              num_partitions=12)
        .orderBy("id").toPandas()
    )
    exp = _single_frame(prim, pdf, ["x"], "y", ["id"])
    # interior rows must be exact; true edges (first/last 3) also exact
    # because they live in the first/last chunk with min_periods=1
    assert np.allclose(out["y"].to_numpy(), exp, equal_nan=True)


def test_cfm_routes_rolling_outlier_via_chunks(spark):
    """End-to-end through calculate_feature_matrix: a global (non-
    grouped) rolling_outlier_count no longer needs the single-group
    collapse — force the cap to 1 row and it must still succeed."""
    import datetime as dt

    import featuretools_spark as fts
    from featuretools_spark.features import IdentityFeature, TransformFeature

    rng = np.random.RandomState(4)
    pdf = pd.DataFrame({
        "id": np.arange(300),
        "val": rng.randn(300),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.arange(300), unit="h"),
    })
    sdf = spark.createDataFrame(pdf)
    es = fts.EntitySet("bw")
    es.add_dataframe("rows", sdf, index="id", time_index="ts")
    val = IdentityFeature(es, "rows", "val")
    f = TransformFeature("rolling_outlier_count", [val])
    import os
    os.environ["FT_SPARK_GLOBAL_PANDAS_MAX_ROWS"] = "1"
    try:
        fm = fts.calculate_feature_matrix(
            [f], es, cutoff_time=dt.datetime(2025, 1, 1))
        rows = {r["id"]: r[f.get_name()] for r in fm.collect()}
    finally:
        del os.environ["FT_SPARK_GLOBAL_PANDAS_MAX_ROWS"]
    prim = f.primitive
    exp = _single_frame(prim, pdf, ["val"], "y", ["ts", "id"])
    ids = pdf.sort_values(["ts", "id"])["id"].to_numpy()
    got = np.array([np.nan if rows[i] is None else rows[i] for i in ids])
    assert np.allclose(got, exp, equal_nan=True)


# ----------------------------------------------------------------------
# savgol_filter numpy fallback (scipy not in this container): the
# kernel is a first-principles LSQ polynomial filter — assert the
# defining properties, then halo-chunked == single-frame.
# ----------------------------------------------------------------------
def test_savgol_numpy_classical_weights():
    """w=5, p=3 central weights are the textbook [-3,12,17,12,-3]/35."""
    from featuretools_spark.primitives.transform import _savgol_numpy

    # impulse response of the interior filter reads the weights back
    y = np.zeros(11)
    y[5] = 35.0
    out = _savgol_numpy(y, 5, 3)
    assert np.allclose(out[3:8], [-3, 12, 17, 12, -3])


def test_savgol_numpy_polynomial_exact_and_contracts():
    """Exact on polynomials of degree <= polyorder (including the
    'interp' edge fits), and scipy's error contracts hold."""
    from featuretools_spark.primitives.transform import _savgol_numpy

    t = np.linspace(0.0, 1.0, 60)
    y = 3 * t**3 - 2 * t**2 + t - 5
    assert np.allclose(_savgol_numpy(y, 7, 3), y, atol=1e-10)
    for w, p in [(4, 3), (5, 5), (0, 0)]:
        with pytest.raises(ValueError):
            _savgol_numpy(y, w, p)
    with pytest.raises(ValueError):
        _savgol_numpy(y[:5], 7, 3)  # mode='interp' needs n >= window


def test_savgol_chunked_parity(spark):
    """SavgolFilter through the halo plumbing == single-frame, on a
    noisy series; edges are polynomial fits kept only at true ends."""
    from featuretools_spark.primitives.transform import SavgolFilter

    rng = np.random.RandomState(7)
    n = 3000
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "x": np.sin(np.arange(n) / 25.0) + rng.normal(0, 0.05, n),
    })
    prim = SavgolFilter(window_length=9, polyorder=3)
    df = spark.createDataFrame(pdf)
    out = (
        bounded_window_global(df, prim, ["x"], "y", ["id"],
                              *prim.halo(), num_partitions=16)
        .orderBy("id").toPandas()
    )
    exp = _single_frame(prim, pdf, ["x"], "y", ["id"])
    assert np.allclose(out["y"].to_numpy(), exp, atol=1e-9)
