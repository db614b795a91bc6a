"""Regression tests for the round-6 ADVICE findings.

1. jpeg.py — progressive scans with out-of-band Ss/Se/Ah/Al must raise
   ValueError (the strict=False degrade-to-NULL contract catches only
   ValueError), never numpy IndexError.
2. cfm.py — suffix-less spark.executor.memory is MiB (Spark's
   JavaUtils.byteStringAsMb), not bytes.
3. dedup.py — simhash_near_duplicates releases its persisted chunk
   table on the success path.
4. cfm.py — a sticky auto-strategy escalation must not inflate
   _kernel_nparts' floor for later jobs.
5. encode.py — gram-path correlation clamps negative variance and
   rejects |corr| > 1 garbage instead of letting it cross the drop
   threshold.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _patch_first_ac_sos(payload: bytes, se_value: int) -> bytes:
    """Return payload with the first AC scan's Se byte overwritten.

    SOS layout: FF DA | len(2) | Ns(1) | Ns*(Cs,TdTa) | Ss | Se | AhAl.
    """
    d = bytearray(payload)
    pos = 0
    while True:
        pos = d.find(b"\xff\xda", pos)
        if pos < 0:
            raise AssertionError("no AC SOS found to patch")
        ns = d[pos + 4]
        ss_at = pos + 5 + 2 * ns
        if d[ss_at] > 0:  # AC scan
            d[ss_at + 1] = se_value
            return bytes(d)
        pos += 2


def test_progressive_rejects_out_of_band_se():
    from featuretools_spark.ops.jpeg import (
        decode_jpeg, encode_jpeg_progressive)

    arr = (np.arange(16 * 16 * 3) % 251).reshape(16, 16, 3).astype(
        np.uint8)
    good = encode_jpeg_progressive(arr)
    decode_jpeg(good)  # sanity: unpatched payload decodes

    bad = _patch_first_ac_sos(good, 200)
    with pytest.raises(ValueError, match="spectral selection"):
        decode_jpeg(bad)


def test_task_memory_budget_suffixless_is_mib():
    from featuretools_spark.cfm import _task_memory_budget

    class _Conf:
        def __init__(self, d):
            self._d = d

        def get(self, k, default=None):
            return self._d.get(k, default)

    class _SC:
        master = "spark://host:7077"

    class _Spark:
        sparkContext = _SC()

        def __init__(self, mem):
            self.conf = _Conf({
                "spark.executor.memory": mem,
                "spark.executor.cores": "1",
                "spark.memory.fraction": "0.6",
            })

    suffixless = _task_memory_budget(_Spark("4096"))
    with_suffix = _task_memory_budget(_Spark("4g"))
    assert suffixless == with_suffix  # 4096 (MiB) == 4g
    # r7 calibration: fair share = heap x memory.fraction / slots
    assert suffixless == int((4096 << 20) * 0.6)


def test_simhash_releases_chunk_cache(spark):
    from featuretools_spark.ops.dedup import simhash_near_duplicates

    texts = [
        ("a", "the quick brown fox jumps over the lazy dog again"),
        ("b", "the quick brown fox jumps over the lazy dog againn"),
        ("c", "entirely different content with no overlap at all xyz"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = simhash_near_duplicates(df, "doc_id", "text", max_hamming=10)
    out.count()  # materialize the result
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    # the chunk table must be unpersisted; at most the (small, eager)
    # localCheckpoint of the filtered pairs remains, and THAT one the
    # ContextCleaner reclaims once `out` is dereferenced — the leak
    # was the signature-scale chunk cache surviving every call
    assert after <= before + 1, (
        f"simhash leaked {after - before} persisted RDD(s)")


def test_kernel_floor_exempt_from_escalated_width(spark):
    from featuretools_spark import cfm

    df = spark.range(100).withColumn("g", F.col("id") % 4)
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    saved = dict(cfm.LAST_PREFLIGHT)
    try:
        # simulate a prior auto-escalation left sticky in the session
        spark.conf.set("spark.sql.shuffle.partitions", "4096")
        cfm.LAST_PREFLIGHT.clear()
        cfm.LAST_PREFLIGHT.update(
            {"parts_before": base, "parts_after": 4096})
        assert cfm._kernel_nparts(df) == base
        # ...but a session genuinely CONFIGURED wide keeps its width
        cfm.LAST_PREFLIGHT.clear()
        assert cfm._kernel_nparts(df) == 4096
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(base))
        cfm.LAST_PREFLIGHT.clear()
        cfm.LAST_PREFLIGHT.update(saved)


def test_gram_corr_clamps_degenerate_variance(spark):
    from featuretools_spark.encode import _corr_matrix_gram

    # a near-constant column whose B - A^2/N cancels catastrophically
    # in float64, plus a real column
    n = 400
    rows = [(1.0e9 + (i % 2) * 1e-4, float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["nearconst", "ramp"])
    corr = _corr_matrix_gram(df, ["nearconst", "ramp"])
    finite = corr[np.isfinite(corr)]
    assert np.all(np.abs(finite) <= 1.0 + 1e-9), corr

    # exactly-constant column: NaN (no variance), never a drop signal
    rows2 = [(7.0, float(i)) for i in range(50)]
    df2 = spark.createDataFrame(rows2, ["const", "ramp"])
    corr2 = _corr_matrix_gram(df2, ["const", "ramp"])
    assert np.isnan(corr2[0, 1]) and np.isnan(corr2[1, 0])
