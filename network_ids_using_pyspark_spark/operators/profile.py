"""Data-profiling operators.

The reference profiles its dirty numerics with three separate full scans:
NaN counts (``ISAA_Review_3.ipynb:531, cell 21``), per-column MAX as a
+Inf detector (``:577, cell 23``) and per-column MIN as a −Inf detector
(``:611, cell 24``).  The engine generalizes all of it:

* :func:`profile_counts` — null / NaN / ±Inf counts for every requested
  column in **one pass** (one partial+final hash-agg job, no shuffle of
  data rows, output is a single row).
* :func:`profile_extremes` — per-column MIN or MAX in one pass; string
  columns get ``first(ignorenulls)`` like the notebook's profile row.

At 100 TB these are map-side-combined single-row aggregates — the only
traffic is one tiny partial-agg row per task.  No UDFs: every expression
is codegen'd (``count(CASE WHEN isnan(c) THEN 1 END)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FLOATING = (T.DoubleType, T.FloatType)


def _is_floating(df: DataFrame, c: str) -> bool:
    return isinstance(df.schema[c].dataType, _FLOATING)


def profile_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-row profile: ``<col>__n_null / __n_nan / __n_posinf / __n_neginf``
    per column (NaN/Inf metrics only for floating columns).

    Engine op ``profile_nan_counts`` (SURVEY.md §2.3 G1, generalized).
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_null")
        )
        if _is_floating(df, c):
            aggs.append(F.sum(F.when(F.isnan(col), 1).otherwise(0)).alias(f"{c}__n_nan"))
            aggs.append(
                F.sum(F.when(col == float("inf"), 1).otherwise(0)).alias(f"{c}__n_posinf")
            )
            aggs.append(
                F.sum(F.when(col == float("-inf"), 1).otherwise(0)).alias(f"{c}__n_neginf")
            )
    return df.agg(*aggs)


def profile_extremes(df: DataFrame, kind: str, cols: list[str] | None = None) -> DataFrame:
    """Per-column global MIN or MAX, one row — engine ops ``profile_max``
    / ``profile_min`` (SURVEY.md §2.3 G2/G3).

    Floating columns exclude NaN from the extreme (Spark's ``max`` ranks
    NaN above +Inf, which would make the +Inf detector useless — the very
    thing the reference used MAX for), so we guard with ``isnan``.
    String columns use ``min``/``max`` directly (deterministic, unlike
    the notebook's ``first``).
    """
    if kind not in ("min", "max"):
        raise ValueError(kind)
    fn = F.min if kind == "min" else F.max
    cols = cols or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        if _is_floating(df, c):
            aggs.append(fn(F.when(~F.isnan(col), col)).alias(f"{kind}_{c}"))
        else:
            aggs.append(fn(col).alias(f"{kind}_{c}"))
    return df.agg(*aggs)
