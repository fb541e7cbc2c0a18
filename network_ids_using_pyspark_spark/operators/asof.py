"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a **union + partitioned window** instead of a range
join: tag right-side rows, union with the left, sort each key's
timeline once, and carry the last-seen right value forward with
``last(..., ignorenulls=True)``.  Cost is one shuffle on the key and
one sort — O(n log n) per key and no row-pair explosion, which is what
a naive ``l.ts >= r.ts`` range join degenerates to at 100 TB.  Skewed
keys are handled by AQE like any other exchange.

Semantics: for each left row, the right row with the greatest
``ts_col`` ≤ the left row's ``ts_col`` (ties on the same instant: the
right row is visible to the left row).  Right side must be unique per
(key, ts) — pre-aggregate to enforce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: ``left`` keeps all its columns plus, for each of
    ``value_cols``, the most recent right-side value at or before its
    timestamp (null if none)."""
    lcols = left.columns
    l_tagged = left.select(
        *lcols, F.lit(0).alias("__is_right"), *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in value_cols]
    )
    r_tagged = right.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c) for c in key_cols],
        F.col(ts_col),
        F.lit(1).alias("__is_right"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    )
    for c in lcols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    # right rows sort BEFORE left rows at the same ts (__is_right desc)
    # so a right value at exactly the left ts is visible (>= semantics)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc(ts_col), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"asof_{v}")
            for v in value_cols
        ],
    )
    return carried.filter(F.col("__is_right") == 0).select(
        *lcols, *[f"asof_{v}" for v in value_cols]
    )
