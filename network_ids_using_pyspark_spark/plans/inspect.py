"""Physical-plan inspection helpers.

Used by plan-level regression tests: the scale contract ("dims
broadcast, facts never shuffle for joins, filters reach the scan") is
asserted on the *plan*, not just observed in timings — so a regression
that silently flips a broadcast join to sort-merge fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def count_in_plan(df: DataFrame, needle: str, mode: str = "formatted") -> int:
    return explain_str(df, mode).count(needle)


def has_pushed_filters(df: DataFrame) -> bool:
    s = explain_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def count_shuffles(df: DataFrame) -> int:
    """Data (shuffle) exchanges only — BroadcastExchange doesn't move
    the fact table and is excluded."""
    s = explain_str(df, "simple")
    return s.count("Exchange") - s.count("BroadcastExchange") - s.count("ReusedExchange")
