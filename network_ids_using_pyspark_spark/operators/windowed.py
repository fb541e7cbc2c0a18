"""Window operators.

The reference's only window is the degenerate global ``row_number`` over
``Window().orderBy(lit('Dst Port'))`` (``modelling.py:83-84``) — an
Exchange-SinglePartition that funnels every row through one task.  The
engine only ever uses *partitioned* windows: state per key, parallel
across keys, which is the shape IDS-style analytics (per-host rolling
rates) needs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import DEC


def ranked(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    kind: str = "row_number",
    out_col: str = "rk",
) -> DataFrame:
    """row_number / rank / dense_rank over a real partition+order key."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[kind]
    w = Window.partitionBy(*part_cols).orderBy(*[F.asc(c) for c in order_cols])
    return df.withColumn(out_col, fn().over(w))


def rolling_dec_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    preceding: int,
    out_col: str = "rolling_sum",
) -> DataFrame:
    """Sliding-frame sum over the last ``preceding``+current rows per key.

    The value is accumulated in DECIMAL, then cast to double: window
    engines disagree on float accumulation order (Spark iterates the
    frame; DuckDB uses a segment tree), so exact decimal arithmetic is
    the only representation where both produce identical bits — and at
    scale it also means results don't drift with partitioning.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-preceding, 0)
    )
    return df.withColumn(out_col, F.sum(F.col(value_col).cast(DEC)).over(w).cast("double"))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Batch sessionization: split each user's event sequence wherever the
    gap to the previous event exceeds ``gap_seconds``; aggregate per
    session.  This is the batch twin of Structured Streaming's
    ``session_window`` (see ``streaming/``) and the engine's batch/stream
    equivalence anchor (SURVEY.md §5.2).

    Two windowed passes over the same (user, ts) partitioning — Catalyst
    reuses a single sort+exchange for both — then one hash agg:
      lag(ts) → new-session flag → running sum = session index.
    Timestamps are compared in exact integer microseconds.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(us).over(w)
    flagged = df.withColumn(
        "__new_sess",
        F.when(prev.isNull(), 1)
        .when(us - prev > gap_seconds * 1_000_000, 1)
        .otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_idx", F.sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessioned.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
        )
    )
