#!/usr/bin/env python
"""q9 microbench v2: guarded lane sum with NO per-row BigDecimal work.

The fast path computes u = term*10^scale in doubles and takes
N = floor(u+0.5) directly.  A per-row guard sends any row whose
fractional part sits within |u|*2^-50 + 2^-50 of the .5 rounding
boundary — the only region where double arithmetic and
HALF_UP(shortestRepr(term), scale) could disagree — to the original
round+cast decimal path, so equivalence holds for EVERY double, with
no assumption about where term came from.

Variants:
  d38    : production SUM(CAST(round(t,9) AS DECIMAL(38,9)))
  glanes : guarded lanes (no round on the fast path)
  sumcheck vs d38, plus an adversarial-value exactness fuzz.
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

_B = 524288  # 2^19
_EPS = 2.0 ** -50


def terms():
    x1, x2, v = F.col("x1"), F.col("x2"), F.col("v")
    p = 1.0 / (1.0 + F.exp(-(0.1 * x1 + 0.2 * x2 - 1.0)))
    w = p * (1.0 - p)
    r = x2 - p
    return [w, w * x1, w * x2, w * x1 * x1, w * x1 * x2, w * x2 * x2,
            r, r * x1, r * x2]


def q9_d38(t):
    return to_d(F.sum(F.round(t, 9).cast("decimal(38, 9)")))


def glane_aggs(t, i, scale=9):
    thresh = 10.0 ** (15 - scale)
    u = t * float(10 ** scale)
    f = u - F.floor(u)
    fast = (F.abs(t) < thresh) & (
        F.abs(f - 0.5) > F.abs(u) * _EPS + _EPS
    )
    n = F.floor(u + 0.5).cast("long")
    l0 = n % _B
    q1 = ((n - l0) / _B).cast("long")
    l1 = q1 % _B
    l2 = ((q1 - l1) / _B).cast("long")
    slow = F.when(~fast, F.round(t, scale).cast(f"decimal(38, {scale})"))
    z = F.lit(0).cast("long")
    return [
        F.sum(F.when(fast, l0).otherwise(z)).alias(f"l0_{i}"),
        F.sum(F.when(fast, l1).otherwise(z)).alias(f"l1_{i}"),
        F.sum(F.when(fast, l2).otherwise(z)).alias(f"l2_{i}"),
        F.sum(slow).alias(f"big_{i}"),
        (F.count(F.when(fast, F.lit(1))) + F.count(slow)).alias(f"cnt_{i}"),
    ]


def lane_total(row, i, scale=9):
    from decimal import Decimal

    if row[f"cnt_{i}"] == 0:
        return None
    s = (int(row[f"l2_{i}"]) * _B * _B + int(row[f"l1_{i}"]) * _B
         + int(row[f"l0_{i}"]))
    v = Decimal(s) / Decimal(10) ** scale
    if row[f"big_{i}"] is not None:
        v += row[f"big_{i}"]
    return float(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(app_name="q9-microbench2", cpus=cpus, shuffle_partitions=cpus)
    o = load_table(spark, args.sf, "orders")
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("x2"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    src.count()

    def timeit(label, df):
        best = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:10s} min-of-{args.reps}: {best:.3f}s", flush=True)

    ts = terms()
    d38 = src.agg(*[q9_d38(t).alias(f"s{i}") for i, t in enumerate(ts)])
    gl = src.agg(*[a for i, t in enumerate(ts) for a in glane_aggs(t, i)])
    timeit("d38", d38)
    timeit("glanes", gl)

    import struct

    want = d38.collect()[0]
    got_row = gl.collect()[0]
    bad = 0
    for i in range(len(ts)):
        w, g = want[f"s{i}"], lane_total(got_row, i)
        if (None if w is None else struct.pack("<d", w)) != (
            None if g is None else struct.pack("<d", g)
        ):
            print(f"term {i}: MISMATCH d38={w!r} lanes={g!r}")
            bad += 1
    print(f"real-data exactness: {len(ts) - bad}/{len(ts)} OK")

    # adversarial fuzz: boundary halves, huge, tiny, negatives, NaN/Inf/null
    import random

    random.seed(7)
    vals = []
    for k in range(20000):
        c = k % 10
        if c == 0:
            vals.append(random.randint(-10**9, 10**9) / 2e9 * 1e-3)  # sub-nano
        elif c == 1:
            vals.append((random.randint(0, 2 * 10**12) + 0.5) / 1e9)  # exact half
        elif c == 2:
            vals.append(random.uniform(-1e7, 1e7))  # beyond threshold
        elif c == 3:
            vals.append(random.uniform(-1e-6, 1e-6))
        elif c == 4:
            vals.append(random.randint(-10**14, 10**14) / 1e9)  # lattice
        elif c == 5:
            vals.append(random.uniform(-999999.0, 999999.0))
        elif c == 6:
            vals.append(float(random.randint(-10**15, 10**15)))  # huge
        elif c == 7:
            vals.append(random.choice([float("nan"), float("inf"),
                                       float("-inf"), None]))
        elif c == 8:
            vals.append((random.randint(0, 10**15) - 0.5) / 1e9)
        else:
            vals.append(random.uniform(-1e6, 1e6) * 10 ** random.randint(-9, 3))
    fz = spark.createDataFrame([(v,) for v in vals], "t double")
    a = fz.agg(
        q9_d38(F.col("t")).alias("want"),
        *glane_aggs(F.col("t"), 0),
    ).collect()[0]
    g = lane_total(a, 0)
    w = a["want"]
    ok = (None if w is None else struct.pack("<d", w)) == (
        None if g is None else struct.pack("<d", g)
    )
    print(f"fuzz exactness: want={w!r} got={g!r} {'OK' if ok else 'MISMATCH'}")
    # all-null and empty frames
    for label, data in (("allnull", [(None,)] * 5), ("empty", [])):
        fr = spark.createDataFrame(data, "t double")
        a = fr.agg(q9_d38(F.col("t")).alias("want"), *glane_aggs(F.col("t"), 0)).collect()[0]
        print(f"{label}: want={a['want']!r} got={lane_total(a, 0)!r} "
              f"{'OK' if a['want'] is None and lane_total(a, 0) is None else 'CHECK'}")
    spark.stop()


if __name__ == "__main__":
    main()
