"""Gates for the r12 guarded lane sum (functions/numeric.py):
`lane_sum_dec` / `q9_lane_sum` must be BIT-EQUAL to the raw
SUM(CAST(round(t, S) AS DECIMAL(38, S))) expression they replace, for
every double — including exact .5 rounding ties (where HALF_UP's
away-from-zero rule differs from floor(u+0.5) and the guard must
reroute the row to the decimal path), magnitudes beyond the fast-path
threshold, NaN/±Inf/NULL, all-NULL and empty inputs, and grouped
aggregation."""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.functions.numeric import (
    lane_sum_dec,
    q9_lane_sum,
)


def _bits(x):
    return None if x is None else struct.pack("<d", x).hex()


def _ref(term, scale):
    return (
        F.sum(F.round(term, scale).cast(f"decimal(38, {scale})"))
        .cast("string")
        .cast("double")
    )


def _fuzz_values(seed, n=30000):
    rng = random.Random(seed)
    vals = []
    for k in range(n):
        c = k % 12
        if c == 0:
            vals.append((rng.randint(0, 2 * 10**12) + 0.5) / 1e9)  # exact + half
        elif c == 1:
            vals.append(-(rng.randint(0, 2 * 10**12) + 0.5) / 1e9)  # exact - half
        elif c == 2:
            vals.append(rng.uniform(-1e8, 1e8))  # beyond q9 threshold
        elif c == 3:
            vals.append(rng.uniform(-1e-7, 1e-7))
        elif c == 4:
            vals.append(rng.randint(-(10**14), 10**14) / 1e9)  # on-lattice
        elif c == 5:
            vals.append(rng.uniform(-999999.9, 999999.9))
        elif c == 6:
            vals.append(float(rng.randint(-(10**15), 10**15)))
        elif c == 7:
            vals.append(rng.choice([float("nan"), float("inf"), float("-inf"), None]))
        elif c == 8:
            vals.append((rng.randint(0, 10**15) - 0.5) / 1e6)  # scale-6 half
        elif c == 9:
            vals.append(rng.uniform(-1e6, 1e6) * 10 ** rng.randint(-9, 4))
        elif c == 10:
            vals.append(rng.randint(-(10**11), 10**11) / 100.0)  # price-like
        else:
            vals.append(rng.uniform(-1.0, 1.0))
    return vals


@pytest.mark.parametrize("scale", [9, 6])
def test_lane_sum_bit_equal_fuzz(spark, scale):
    df = spark.createDataFrame([(v,) for v in _fuzz_values(scale)], "t double")
    row = df.agg(
        _ref(F.col("t"), scale).alias("want"),
        lane_sum_dec(F.col("t"), scale).cast("string").cast("double").alias("got"),
    ).collect()[0]
    assert _bits(row["want"]) == _bits(row["got"]), (row["want"], row["got"])


def test_lane_sum_exact_half_ties_take_slow_path(spark):
    # values whose 9th-decimal fraction is EXACTLY .5: HALF_UP rounds
    # away from zero; an unguarded floor(u+0.5) would round toward +inf
    # for negatives.  The guard must reroute these rows.
    vals = [(k + 0.5) / 1e9 for k in range(-50, 50)]
    df = spark.createDataFrame([(v,) for v in vals], "t double")
    row = df.agg(
        _ref(F.col("t"), 9).alias("want"), q9_lane_sum(F.col("t")).alias("got")
    ).collect()[0]
    assert _bits(row["want"]) == _bits(row["got"]), (row["want"], row["got"])


def test_lane_sum_null_semantics(spark):
    allnull = spark.createDataFrame([(None,)] * 7, "t double")
    row = allnull.agg(
        _ref(F.col("t"), 9).alias("want"), q9_lane_sum(F.col("t")).alias("got")
    ).collect()[0]
    assert row["want"] is None and row["got"] is None
    empty = spark.createDataFrame([], "t double")
    row = empty.agg(
        _ref(F.col("t"), 9).alias("want"), q9_lane_sum(F.col("t")).alias("got")
    ).collect()[0]
    assert row["want"] is None and row["got"] is None
    # NaN/Inf-only input: every row casts to NULL on both paths
    nn = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (float("-inf"),)], "t double"
    )
    row = nn.agg(
        _ref(F.col("t"), 9).alias("want"), q9_lane_sum(F.col("t")).alias("got")
    ).collect()[0]
    assert row["want"] is None and row["got"] is None


def test_lane_sum_grouped(spark):
    rng = random.Random(99)
    rows = [(k % 5, rng.uniform(-1e5, 1e5)) for k in range(5000)]
    rows += [(k % 5, (rng.randint(0, 10**12) + 0.5) / 1e9) for k in range(500)]
    df = spark.createDataFrame(rows, "g int, t double")
    got = (
        df.groupBy("g")
        .agg(
            _ref(F.col("t"), 9).alias("want"),
            q9_lane_sum(F.col("t")).alias("got"),
        )
        .collect()
    )
    for r in got:
        assert _bits(r["want"]) == _bits(r["got"]), (r["g"], r["want"], r["got"])


def test_lane_sum_conditional_terms(spark):
    # the conditional-aggregate shape the stats family uses:
    # sum(when(pred, term)) — null non-matches must stay skipped
    rng = random.Random(5)
    rows = [(k % 2, rng.uniform(-1e4, 1e4)) for k in range(4000)]
    df = spark.createDataFrame(rows, "y int, t double")
    term = F.when(F.col("y") == 1, F.col("t") * F.col("t"))
    row = df.agg(
        _ref(term, 9).alias("want"), q9_lane_sum(term).alias("got")
    ).collect()[0]
    assert _bits(row["want"]) == _bits(row["got"])


def _raw_dec_sum(c):
    # the pre-r12 dec_sum expression, verbatim — the reference the lane
    # implementation must reproduce bit-for-bit
    return F.sum(c.cast("decimal(30, 6)")).cast("double")


def test_dec_lane_sum_bit_equal_fuzz(spark):
    from network_ids_using_pyspark_spark.functions.numeric import dec_lane_sum

    df = spark.createDataFrame([(v,) for v in _fuzz_values(42)], "t double")
    row = df.agg(
        _raw_dec_sum(F.col("t")).alias("want"),
        dec_lane_sum(F.col("t")).alias("got"),
    ).collect()[0]
    assert _bits(row["want"]) == _bits(row["got"]), (row["want"], row["got"])


def test_dec_lane_sum_long_input(spark):
    # dec_sum is sometimes fed integer columns; the fast path must be
    # exact there too (integers sit on the lattice; beyond 1e9 the
    # guard reroutes, and long->double conversion never gets a chance
    # to lose bits on the fast path)
    rng = random.Random(3)
    vals = [rng.randint(-(2**62), 2**62) for _ in range(300)]
    vals += [rng.randint(-(10**9), 10**9) for _ in range(3000)]
    from network_ids_using_pyspark_spark.functions.numeric import dec_lane_sum

    df = spark.createDataFrame([(v,) for v in vals], "t long")
    row = df.agg(
        _raw_dec_sum(F.col("t")).alias("want"),
        dec_lane_sum(F.col("t")).alias("got"),
    ).collect()[0]
    assert _bits(row["want"]) == _bits(row["got"]), (row["want"], row["got"])


def test_lane_sum_result_dtype_matches(spark):
    df = spark.createDataFrame([(1.25,)], "t double")
    out = df.agg(
        F.sum(F.round(F.col("t"), 9).cast("decimal(38, 9)")).alias("want"),
        lane_sum_dec(F.col("t"), 9).alias("got"),
    )
    types = dict(out.dtypes)
    assert types["want"] == types["got"] == "decimal(38,9)"
