"""Approx-sketch operators (the 100 TB substitutes for exact
aggregates) tolerance-tested against their exact counterparts
(SURVEY.md §7.3: approx variants can't be oracle-hashed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_approx_count_distinct_within_tolerance(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.05)).collect()[0][0]
    assert abs(approx - exact) <= max(1, 0.1 * exact)


def test_percentile_approx_close_to_exact_median(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.select(F.median("l_extendedprice")).collect()[0][0]
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 10000)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.01
