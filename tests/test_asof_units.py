"""Constructed-case semantics tests for the as-of join operator."""

from __future__ import annotations

import datetime as dt

from network_ids_using_pyspark_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(30)), (2, 10, _ts(5)), (3, 20, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(10), 111.0), (10, _ts(30), 222.0), (20, _ts(40), 333.0)],
        "user_id long, ts timestamp, px double",
    )
    out = {r["event_id"]: r["asof_px"]
           for r in asof_join(left, right, ["user_id"], "ts", ["px"]).collect()}
    assert out[1] == 222.0  # same-instant right row is visible (>= semantics)
    assert out[2] is None  # nothing at or before 10:05 for user 10
    assert out[3] is None  # user 20's only row is later than 10:30
