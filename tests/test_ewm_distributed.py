"""Distributed (segmented-scan) EWM: parity with pandas across many
range partitions — the scale path for global-ordering EWM transforms
(reference semantics: primitives/standard/transform/numeric/
exponential_weighted_average.py etc., pandas ewm adjust=True).
"""

import numpy as np
import pandas as pd
import pytest

from featuretools_spark.ewm import _finalize, _scan_chunk, ewm_global


def _pandas_ewm(s, kind, **kw):
    return getattr(s.ewm(**kw), kind)().to_numpy()


@pytest.mark.parametrize("alpha", [0.01, 0.3, 0.9, 1.0])
@pytest.mark.parametrize("ignore_na", [False, True])
def test_scan_chunk_matches_pandas(alpha, ignore_na):
    rng = np.random.RandomState(0)
    x = rng.randn(4000)
    x[rng.rand(4000) < 0.15] = np.nan
    D, N, M, W2, CNT, _, _ = _scan_chunk(
        x, alpha, ignore_na, (0.0, 0.0, 0.0, 0.0, 0.0))
    s = pd.Series(x)
    for kind in ("mean", "var", "std"):
        got = _finalize(kind, D, N, M, W2, CNT)
        exp = _pandas_ewm(s, kind, alpha=alpha, ignore_na=ignore_na)
        assert np.allclose(got, exp, equal_nan=True, atol=1e-9, rtol=1e-7), \
            (alpha, ignore_na, kind)


def test_carry_split_equals_single_scan():
    """Splitting a sequence at an arbitrary boundary and feeding the
    end-state as the next chunk's carry must reproduce the unsplit
    scan exactly — the invariant the two-pass distributed evaluation
    rests on."""
    rng = np.random.RandomState(1)
    x = rng.randn(3000)
    x[rng.rand(3000) < 0.1] = np.nan
    for ig in (False, True):
        full = _scan_chunk(x, 0.25, ig, (0.0,) * 5)
        a = _scan_chunk(x[:1111], 0.25, ig, (0.0,) * 5)
        carry = tuple(arr[-1] for arr in a[:5])
        b = _scan_chunk(x[1111:], 0.25, ig, carry)
        for i in range(5):
            assert np.allclose(np.concatenate([a[i], b[i]]), full[i],
                               equal_nan=True)


@pytest.mark.parametrize("kind", ["mean", "std", "var"])
def test_ewm_global_multi_partition(spark, kind):
    rng = np.random.RandomState(7)
    n = 50_000
    pdf = pd.DataFrame({"id": np.arange(n), "x": rng.randn(n)})
    pdf.loc[rng.rand(n) < 0.05, "x"] = np.nan
    df = spark.createDataFrame(pdf)
    out = (
        ewm_global(df, "x", "y", ["id"], kind=kind, com=0.5,
                   num_partitions=16)
        .orderBy("id").toPandas()
    )
    # really distributed: more than one range partition carried state
    exp = _pandas_ewm(pdf["x"], kind, com=0.5)
    assert np.allclose(out["y"].to_numpy(), exp, equal_nan=True,
                       atol=1e-9, rtol=1e-6)


def test_ewm_global_tiny_alpha_long_run(spark):
    """alpha small enough that weights decay slowly across partition
    boundaries — the carry term stays numerically significant."""
    rng = np.random.RandomState(9)
    n = 20_000
    pdf = pd.DataFrame({"id": np.arange(n), "x": rng.randn(n)})
    df = spark.createDataFrame(pdf)
    out = (
        ewm_global(df, "x", "y", ["id"], kind="mean", alpha=1e-4,
                   num_partitions=12)
        .orderBy("id").toPandas()
    )
    exp = _pandas_ewm(pdf["x"], "mean", alpha=1e-4)
    assert np.allclose(out["y"].to_numpy(), exp, atol=1e-9, rtol=1e-6)


def test_missing_pid_carry_default_is_valid_five_tuple():
    """ADVICE r3: finalize's zero-carry default (used when a pid is
    absent from the broadcast carries) must be a 5-tuple that
    reproduces a from-scratch scan — 4 elements raised ValueError in
    the executor."""
    import inspect

    import featuretools_spark.ewm as ewm_mod

    x = np.array([1.0, np.nan, 3.0, 2.0])
    default = (0.0, 0.0, 0.0, 0.0, 0.0)
    D, N, M, W2, CNT, _, _ = _scan_chunk(x, 0.4, False, default)
    exp = pd.Series(x).ewm(alpha=0.4).mean().to_numpy()
    assert np.allclose(_finalize("mean", D, N, M, W2, CNT), exp,
                       equal_nan=True)
    # the in-source default literal is the 5-element one
    src = inspect.getsource(ewm_mod.ewm_global)
    assert "(0.0, 0.0, 0.0, 0.0, 0.0)" in src
