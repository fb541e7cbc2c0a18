"""Predictions sink + readback.

The reference's serving path (``/root/reference/src/spark_to_cassandra.py``)
is a driver-side Python loop issuing prepared INSERTs into a Cassandra
(AWS Keyspaces) table ``testing_node.predictions (vals int, prediction
int)`` in unlogged batches (``spark_to_cassandra.py:24-30``) and reading
back with a full-table SELECT (``:19,31``).  That loop is a driver
bottleneck and never parallelizes.

The engine replaces it with a DataFrame sink: executors write in parallel,
the driver never sees the rows.  Locally the sink format is parquet; on a
real cluster the same call takes ``format("org.apache.spark.sql.cassandra")``
or any JDBC/Delta sink — the operator contract (schema + mode) is what we
test.  The streaming variant is ``writeStream.foreachBatch`` (see
``streaming/``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PREDICTIONS_SCHEMA_COLS = ("vals", "prediction")


def sink_predictions(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> None:
    """Engine op ``sink_predictions`` (SURVEY.md §2.1 A3).

    Enforces the serving contract's two-column schema, then writes in
    parallel from the executors.  ``mode='append'`` matches the unlogged-
    batch INSERT semantics (no upsert in the reference either).

    ``fmt``/``options`` parameterize the connector: the reference's
    external table is reached with
    ``fmt="org.apache.spark.sql.cassandra",
    options={"keyspace": "testing_node", "table": "predictions"}``, a
    warehouse with ``fmt="jdbc", options={"url": ..., "dbtable": ...}``
    — same contract, same parallel write path.  Parquet (the default)
    is the only format exercised in this sandbox (no external DB here);
    the dispatch itself is tested in tests/test_sources.py.
    """
    missing = [c for c in PREDICTIONS_SCHEMA_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"predictions sink requires columns {PREDICTIONS_SCHEMA_COLS}, missing {missing}")
    out = df.select(
        F.col("vals").cast("long").alias("vals"),
        F.col("prediction").cast("int").alias("prediction"),
    )
    writer = out.write.mode(mode).format(fmt)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if fmt in ("parquet", "orc", "json", "csv"):
        writer.save(path)
    else:  # connector formats address the table via options, not a path
        writer.save()


def scan_predictions(spark: SparkSession, path: str) -> DataFrame:
    """Engine op ``scan_predictions`` (SURVEY.md §2.1 A4) — readback,
    the analog of ``SELECT * FROM testing_node.predictions``."""
    return spark.read.parquet(path)
