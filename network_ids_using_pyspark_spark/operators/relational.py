"""Core relational operators.

These re-express the reference's driver-side EDA (pandas ``value_counts``
at ``ISAA_Review_3.ipynb:187``, distinct-label collects at
``modelling.py:86-87,139``) as distributed, lazily-composable DataFrame
ops.  All are partial-aggregation-friendly: at 100 TB each is one
map-side-combined hash agg whose shuffle carries only (group-key, partial
state) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_histogram(df: DataFrame, col: str, count_alias: str = "n") -> DataFrame:
    """Engine op ``label_histogram`` (SURVEY.md §2.3 G9): grouped counts,
    descending — the distributed ``value_counts``."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias(count_alias)).orderBy(
        F.desc(count_alias), F.asc(col)
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """Engine op ``distinct_labels`` (SURVEY.md §2.3 G5).  Catalyst prunes
    the scan to the single column before the distinct agg."""
    return df.select(col).distinct()


def count_distinct_values(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """Engine op ``count_distinct_labels`` (SURVEY.md §2.3 G6).

    ``approx=True`` swaps in HyperLogLog++ (`approx_count_distinct`) —
    the 100 TB path when the distinct count feeds a heuristic (like the
    reference's MLP output-layer sizing at ``modelling.py:139``) rather
    than an exact contract.
    """
    agg = (
        F.approx_count_distinct(col) if approx else F.countDistinct(col)
    ).alias(f"n_distinct_{col}")
    return df.agg(agg)


def top_k_per_group(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    k: int,
    tie_break: list[str],
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per group via a *partitioned* window — never the
    reference's unpartitioned ``Window().orderBy(lit(...))`` single-task
    bottleneck (``modelling.py:83-84``).

    ``tie_break`` columns are mandatory: without a total order the
    selected rows are nondeterministic under re-partitioning, which would
    make results change run-to-run at scale (and break the oracle check).
    Adds a ``rk`` rank column.
    """
    ordering = [F.desc(order_col) if descending else F.asc(order_col)]
    ordering += [F.asc(c) for c in tie_break]
    w = Window.partitionBy(*part_cols).orderBy(*ordering)
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def salted_count(
    df: DataFrame, key_col: str, salt_buckets: int = 8, count_alias: str = "n"
) -> DataFrame:
    """Skew-resistant grouped count: two-phase aggregation through a
    salt — phase 1 spreads each hot key over ``salt_buckets`` reducers
    (groupBy(key, salt)), phase 2 merges the partials (groupBy(key)).
    Semantics identical to a plain groupBy-count (which is exactly how
    it's oracle-checked); the plan trades one extra tiny shuffle for
    bounded per-reducer load under arbitrary key skew.  (For counts
    Spark's partial aggregation already bounds skew — the pattern
    matters for aggregates without map-side combine, e.g.
    collect_list/exact-distinct — but the operator shape is the same.)"""
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key_col, "__salt").agg(F.count(F.lit(1)).alias("__pc"))
    return partial.groupBy(key_col).agg(F.sum("__pc").alias(count_alias))
