"""Cleaning operators: the reference's dirty-numeric semantics, UDF-free.

The reference's only UDF is ``replace_infs_udf`` (``modelling.py:61-67``,
``ISAA_Review_3.ipynb:664-668``) — a per-row Python lambda that replaces
±Inf with a supplied value.  It breaks whole-stage codegen and predicate
pushdown and round-trips every row through a pickled Python worker.  Here
the same semantics are a native ``CASE WHEN`` — codegen'd, pushdown-safe,
and expressible in the DuckDB oracle.

Scalar-dependent variants (replace-with-max, impute-median) need a global
aggregate as a literal.  The reference collects it to the driver
(``modelling.py:65,68``) — legitimate for one scalar, but it forces an
eager action.  We instead ``crossJoin(broadcast(agg_row))``: still one
job, stays lazy/composable, and at 100 TB the broadcast is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replace_inf(df: DataFrame, cols: list[str], value: float) -> DataFrame:
    """±Inf → ``value``; NaN and null pass through unchanged (matching the
    reference UDF's observed behavior on null, minus its ``x and …`` bug
    that also skipped ``x == 0.0`` — see SURVEY.md §2.8 U1)."""
    updates = {
        c: F.when(F.col(c).isin(float("inf"), float("-inf")), F.lit(value)).otherwise(F.col(c))
        for c in cols
    }
    return df.withColumns(updates)


def replace_inf_with_max(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """Engine op ``replace_inf_with_max`` (SURVEY.md §2.8): replace ±Inf in
    ``col`` with the column's max over finite values.

    Single logical plan: a one-row broadcast of ``max(finite(col))``
    cross-joined back — no driver collect, no second scan pass baked into
    the plan by hand (Catalyst may still schedule the agg as its own
    stage, which is the minimum possible work for this semantics).
    """
    out_col = out_col or col
    c = F.col(col)
    finite = F.when(~F.isnan(c) & ~c.isin(float("inf"), float("-inf")), c)
    mx = df.agg(F.max(finite).alias("__finite_max"))
    joined = df.crossJoin(F.broadcast(mx))
    return joined.withColumn(
        out_col,
        F.when(c.isin(float("inf"), float("-inf")), F.col("__finite_max")).otherwise(c),
    ).drop("__finite_max")


def impute_median_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Engine op ``impute_median_exact``: fill nulls with the exact column
    median (``F.median`` = exact 50th percentile, interpolating on even
    counts — same contract as DuckDB ``median`` over numerics, which is
    what makes this oracle-checkable; the MLlib ``Imputer`` with its
    ``approxQuantile(…, 0.001)`` sketch lives in ``ml/`` as
    ``impute_median`` and is tolerance-tested instead — SURVEY.md §7.3).

    NaN is excluded from the median computation but is *not* imputed —
    null-only fill, matching ``Imputer``'s null handling.

    Even-count interpolation: Spark's ``F.median`` computes
    ``lower/2 + upper/2`` — NOT ``(lower + upper)/2`` (differs by 1 ulp
    on subnormals, e.g. ``[2.2e-311, 5e-324]``) and NOT
    ``lower + (upper - lower)/2`` (differs by 1 ulp on ordinary values,
    e.g. ``[1/3, 1.0]`` — the r9 Hypothesis find that corrected r7's
    documentation of this formula; ulp-verified against 35 adversarial
    pairs).  DuckDB's DOUBLE ``median`` uses the same ``lower/2 +
    upper/2`` form on both counterexample classes, so oracle parity is
    principled, not fixture luck; tests asserting exact equality must
    mirror it (tests/test_sampling.py).

    Scale: exact median needs a sort-based aggregate; for the 100 TB path
    prefer ``ml.impute_median`` (approx sketch, one pass, mergeable).
    """
    meds = df.agg(
        *[
            F.median(F.when(~F.isnan(F.col(c)), F.col(c))).alias(f"__med_{c}")
            for c in cols
        ]
    )
    out = df.crossJoin(F.broadcast(meds))
    updates = {c: F.coalesce(F.col(c), F.col(f"__med_{c}")) for c in cols}
    return out.withColumns(updates).drop(*[f"__med_{c}" for c in cols])


def drop_null_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Engine op ``drop_null_rows`` (SURVEY.md §2.2 P7).

    Same semantics as ``na.drop(how='any')`` but expressed as an
    explicit IsNotNull conjunction: ``na.drop`` compiles to an
    ``AtLeastNNonNulls`` predicate that parquet can't evaluate, whereas
    IsNotNull pushes into the scan and prunes row groups via null
    counts (verified in tests/test_plans.py) — the difference between
    scanning and skipping at 100 TB."""
    pred = None
    for c in cols or df.columns:
        p = F.col(c).isNotNull()
        pred = p if pred is None else (pred & p)
    return df.filter(pred)
