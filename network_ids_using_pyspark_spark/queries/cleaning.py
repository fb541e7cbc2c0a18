"""Cleaning-operator queries.

The fixture star schema is clean, so each query first *synthesizes* the
reference's dirty-data patterns (NaN / ±Inf / NULL — SURVEY.md §1.2)
deterministically from ``l_orderkey`` residues, identically in Spark and
in the oracle SQL.  That turns every cleaning op into a fully
hash-checkable query instead of a rows-only one.

Dirty pattern (disjoint residue classes of prime moduli):
    l_orderkey % 211 == 0 → NaN
    l_orderkey % 193 == 0 → +Inf
    l_orderkey % 197 == 0 → −Inf
    l_orderkey % 199 == 0 → NULL
    otherwise             → l_extendedprice
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..operators.cleaning import (
    drop_null_rows,
    impute_median_exact,
    replace_inf,
    replace_inf_with_max,
)
from ..operators.profile import profile_counts
from . import register

_DIRTY_SQL = """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey % 211 = 0 THEN 'nan'::DOUBLE
                WHEN l_orderkey % 193 = 0 THEN 'infinity'::DOUBLE
                WHEN l_orderkey % 197 = 0 THEN '-infinity'::DOUBLE
                WHEN l_orderkey % 199 = 0 THEN NULL
                ELSE l_extendedprice END AS val
    FROM lineitem
"""


def _dirty(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    val = (
        F.when(k % 211 == 0, F.lit(float("nan")))
        .when(k % 193 == 0, F.lit(float("inf")))
        .when(k % 197 == 0, F.lit(float("-inf")))
        .when(k % 199 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_extendedprice"))
    )
    return li.select("l_orderkey", "l_linenumber", val.alias("val"))


@register(
    "profile_nan_counts",
    f"""
    SELECT CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS val__n_null,
           CAST(SUM(CASE WHEN isnan(val) THEN 1 ELSE 0 END) AS BIGINT) AS val__n_nan,
           CAST(SUM(CASE WHEN val = 'infinity'::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS val__n_posinf,
           CAST(SUM(CASE WHEN val = '-infinity'::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS val__n_neginf
    FROM ({_DIRTY_SQL})
    """,
)
def q_profile_nan_counts(spark, sf_dir):
    """SURVEY.md §2.3 G1 generalized: null+NaN+±Inf in ONE pass (the
    reference needed three separate full scans, notebook cells 21/23/24)."""
    return profile_counts(_dirty(spark, sf_dir), ["val"])


@register(
    "replace_inf_fixed",
    f"""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN isinf(val) THEN 4000000.0
                WHEN isnan(val) THEN 0.0
                ELSE val END AS val
    FROM ({_DIRTY_SQL})
    """,
)
def q_replace_inf_fixed(spark, sf_dir):
    """SURVEY.md §2.8 U1 as a native expression: ±Inf → sentinel
    4,000,000.0 (the reference's own replacement value,
    ``ISAA_Review_3.ipynb:691``); NaN → 0 so the *output* carries no
    non-finite values (oracle-hash rule)."""
    df = replace_inf(_dirty(spark, sf_dir), ["val"], 4_000_000.0)
    return df.withColumn(
        "val", F.when(F.isnan(F.col("val")), F.lit(0.0)).otherwise(F.col("val"))
    )


@register(
    "replace_inf_with_max",
    f"""
    WITH dirty AS ({_DIRTY_SQL}),
    mx AS (
      SELECT MAX(CASE WHEN NOT isinf(val) AND NOT isnan(val) THEN val END) AS m
      FROM dirty
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN isinf(val) THEN mx.m
                WHEN isnan(val) THEN 0.0
                ELSE val END AS val
    FROM dirty, mx
    """,
)
def q_replace_inf_with_max(spark, sf_dir):
    """SURVEY.md §2.8: ±Inf → max of finite values, computed as a one-row
    broadcast instead of the reference's two collect() round-trips
    (``modelling.py:65-68``).  NaN → 0 for hash-safe output."""
    df = replace_inf_with_max(_dirty(spark, sf_dir), "val")
    return df.withColumn(
        "val", F.when(F.isnan(F.col("val")), F.lit(0.0)).otherwise(F.col("val"))
    )


_NULLY_SQL = """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey % 199 = 0 THEN NULL ELSE l_extendedprice END AS val
    FROM lineitem
"""


@register(
    "impute_median_exact",
    f"""
    WITH nully AS ({_NULLY_SQL}),
    med AS (SELECT MEDIAN(val) AS m FROM nully)
    SELECT l_orderkey, l_linenumber, COALESCE(val, med.m) AS val
    FROM nully, med
    """,
)
def q_impute_median_exact(spark, sf_dir):
    """SURVEY.md §2.3 G7 / §2.9 M1: null → exact column median.  Exact
    (sort-based) variant for oracle parity; the MLlib approx-sketch
    variant is ``ml.impute_median`` (rows-only + tolerance tests)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    nully = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(k % 199 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_extendedprice"))
        .alias("val"),
    )
    return impute_median_exact(nully, ["val"])


@register(
    "drop_null_rows",
    f"SELECT l_orderkey, l_linenumber, val FROM ({_NULLY_SQL}) WHERE val IS NOT NULL",
)
def q_drop_null_rows(spark, sf_dir):
    """SURVEY.md §2.2 P7 — na.drop as a pushdown-friendly IsNotNull."""
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    nully = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(k % 199 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_extendedprice"))
        .alias("val"),
    )
    return drop_null_rows(nully, ["val"])
