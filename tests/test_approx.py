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


def test_cms_guarantees(spark):
    """CMS contract: estimate >= true count for EVERY key (not just the
    heavy hitters), and overestimation bounded by ~2N/w on average."""
    from network_ids_using_pyspark_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )
    from network_ids_using_pyspark_spark.sources.tables import load_table

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("user_id")
    n_total = ev.count()
    counters = cms_counters(ev, "user_id", d=4, w=64)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(truth, counters, "user_id", d=4, w=64)
    rows = est.collect()
    assert all(r["cms_est"] >= r["true_n"] for r in rows)
    mean_over = sum(r["cms_est"] - r["true_n"] for r in rows) / len(rows)
    assert mean_over <= 2 * n_total / 64, mean_over
    # counter relation is d*w max — broadcastable by construction
    assert counters.count() <= 4 * 64


def test_bloom_prefilter_selectivity(spark):
    """Bloom contract: no false negatives (final result == plain semi
    join), and the prefilter actually prunes (candidates well under the
    full fact count, near the true matching fraction)."""
    from network_ids_using_pyspark_spark.operators.sketch import (
        bloom_bits,
        bloom_semi_join,
    )
    from network_ids_using_pyspark_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    keys = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    got = bloom_semi_join(li, keys, "l_orderkey", "o_orderkey")
    exact = li.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert got.count() == exact.count()

    # candidate count after the map-side Bloom pass alone
    bits = bloom_bits(keys, "o_orderkey")
    from network_ids_using_pyspark_spark.functions.hashing import hash_bucket

    cond = None
    for i in range(3):
        c = F.array_contains(F.col("__bloom_bits"), hash_bucket("l_orderkey", 4096, seed=f"bloom{i}"))
        cond = c if cond is None else (cond & c)
    n_cand = li.join(F.broadcast(bits)).filter(cond).count()
    n_fact, n_match = li.count(), exact.count()
    assert n_cand >= n_match  # no false negatives
    # fpr ~ (1 - e^{-kn/m})^k; with small n/m this prunes hard
    assert n_cand < 0.5 * n_fact, (n_cand, n_fact)
