"""Interval (range-containment) join — the other non-equi join Spark
lacks a native scale path for (sibling of ``operators/asof.py``).

A naive ``p.ts BETWEEN i.start AND i.end`` join has no equi key, so
Spark plans BroadcastNestedLoopJoin — O(|points| × |intervals|) work
and a driver-killing broadcast once the interval side grows.  The scale
path here is the standard time-bucketing decomposition:

* each interval explodes into the fixed-width buckets it overlaps
  (explosion factor ≈ interval_len / bucket + 1 — bounded when interval
  lengths are bounded, the common case);
* each point computes its single bucket map-side;
* the join becomes an EQUI-join on bucket id (hash-partitioned shuffle,
  AQE-skew-splittable) followed by the exact containment verify on the
  surviving candidates only.

Each point's bucket is unique, so a (point, interval) pair can match in
at most one bucket — no post-join dedup needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= ts < end`` (half-open), via the bucket equi-join above.
    Returns all columns of both inputs."""
    epoch = lambda c: F.col(c).cast("double")  # noqa: E731
    pb = points.withColumn(
        "__b", F.floor(epoch(ts_col) / bucket_seconds).cast("long")
    )
    ib = intervals.withColumn(
        "__bs",
        F.sequence(
            F.floor(epoch(start_col) / bucket_seconds).cast("long"),
            F.floor(epoch(end_col) / bucket_seconds).cast("long"),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    joined = pb.join(ib, on="__b", how="inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__b")
