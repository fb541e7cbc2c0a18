#!/usr/bin/env python
"""Microbenchmark for VERDICT r11 ask #1: where does the q9
DECIMAL(38,9) aggregation tax actually go, and can exact long "lanes"
replace the decimal SUM without changing a single output bit?

Variants, each a 9-aggregate no-groupBy scan over the orders fact
(the exact shape of the IRLS/OLS moment scans in stats_causal /
stats_regression), timed min-of-N through the noop sink:

  d38     : current production — SUM(CAST(round(t, 9) AS DECIMAL(38,9)))
  dbl     : plain double sums (NOT value-safe; the lower bound)
  d38nr   : decimal sums WITHOUT the round (isolates round() cost)
  rnd     : round+cast per row, single COUNT agg (isolates per-row cost)
  lanes   : exact hi/lo long lanes (3 long sums + rare-row decimal
            + count per term) — the candidate replacement
  sumcheck: asserts lanes reproduces d38's EXACT per-term doubles

Run on an idle box:  python tools/q9_microbench.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from network_ids_using_pyspark_spark.session import get_spark  # noqa: E402
from network_ids_using_pyspark_spark.sources.tables import load_table  # noqa: E402

to_d = lambda c: c.cast("string").cast("double")  # noqa: E731

# the 9 IRLS-moment-shaped terms over (x1=month, x2=flag, v=price)
def terms():
    x1, x2, v = F.col("x1"), F.col("x2"), F.col("v")
    p = 1.0 / (1.0 + F.exp(-(0.1 * x1 + 0.2 * x2 - 1.0)))  # sigmoid-ish weight
    w = p * (1.0 - p)
    r = x2 - p
    return [w, w * x1, w * x2, w * x1 * x1, w * x1 * x2, w * x2 * x2,
            r, r * x1, r * x2]


def q9_d38(t):
    return to_d(F.sum(F.round(t, 9).cast("decimal(38, 9)")))


def q9_dbl(t):
    return F.sum(F.round(t, 9))


def q9_d38_noround(t):
    return to_d(F.sum(t.cast("decimal(38, 9)")))


_B = 524288  # 2^19 lane base


def lane_aggs(t, i):
    """Exact lanes: R=round(t,9); |R|<1e6 rows -> integer nanos split
    into 3 signed 19-bit lanes (sums provably < 2^63 for <=1e13 rows);
    |R|>=1e6 rows -> the unchanged DECIMAL(38,9) path."""
    r = F.round(t, 9)
    small = r.isNotNull() & (F.abs(r) < 1e6)
    nanos = F.floor(r * 1e9 + 0.5).cast("long")
    # % truncates like Java; (nanos - l0) is exactly divisible by the
    # power-of-two base, so the double division below is exact and the
    # quotient (< 2^45) casts back to long losslessly
    l0 = nanos % _B
    q1 = ((nanos - l0) / _B).cast("long")
    l1 = q1 % _B
    l2 = ((q1 - l1) / _B).cast("long")
    big = F.when(~small, r.cast("decimal(38, 9)"))
    z = F.lit(0).cast("long")
    return [
        F.sum(F.when(small, l0).otherwise(z)).alias(f"l0_{i}"),
        F.sum(F.when(small, l1).otherwise(z)).alias(f"l1_{i}"),
        F.sum(F.when(small, l2).otherwise(z)).alias(f"l2_{i}"),
        F.sum(big).alias(f"big_{i}"),
        F.count(r).alias(f"cnt_{i}"),
    ]


def lane_total(row, i):
    """Recombine one term's lanes driver-side (for sumcheck only; the
    production recombination is the same arithmetic in decimal SQL)."""
    from decimal import Decimal

    if row[f"cnt_{i}"] == 0:
        return None
    s = (int(row[f"l2_{i}"]) * _B * _B + int(row[f"l1_{i}"]) * _B
         + int(row[f"l0_{i}"]))
    v = Decimal(s) / Decimal(10) ** 9
    if row[f"big_{i}"] is not None:
        v += row[f"big_{i}"]
    return float(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(app_name="q9-microbench", cpus=cpus, shuffle_partitions=cpus)
    o = load_table(spark, args.sf, "orders")
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("x2"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    src.count()  # warm file index

    def timeit(label, df):
        best = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:10s} min-of-{args.reps}: {best:.3f}s", flush=True)
        return best

    ts = terms()
    variants = {
        "d38": src.agg(*[q9_d38(t).alias(f"s{i}") for i, t in enumerate(ts)]),
        "dbl": src.agg(*[q9_dbl(t).alias(f"s{i}") for i, t in enumerate(ts)]),
        "d38nr": src.agg(*[q9_d38_noround(t).alias(f"s{i}") for i, t in enumerate(ts)]),
        "rnd": src.agg(
            F.count(F.round(ts[0], 9).cast("decimal(38, 9)")).alias("c")
        ),
        "lanes": src.agg(*[a for i, t in enumerate(ts) for a in lane_aggs(t, i)]),
    }
    for label, df in variants.items():
        timeit(label, df)

    # exactness check: lanes must reproduce d38 bit-for-bit
    want = variants["d38"].collect()[0]
    got_row = variants["lanes"].collect()[0]
    got = [lane_total(got_row, i) for i in range(len(ts))]
    import struct

    for i in range(len(ts)):
        w, g = want[f"s{i}"], got[i]
        bw = struct.pack("<d", w).hex() if w is not None else None
        bg = struct.pack("<d", g).hex() if g is not None else None
        status = "OK " if bw == bg else "MISMATCH"
        print(f"term {i}: d38={w!r} lanes={g!r} {status}")
    spark.stop()


if __name__ == "__main__":
    main()
