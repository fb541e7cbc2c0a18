"""Bucketed table layout — the shuffle-free co-located join.

Bucketing is THE 100 TB join strategy for repeated big⋈big joins on a
stable key: both tables are written pre-hash-partitioned into the same
number of buckets on the join key, so every future join between them is
exchange-free — each task zips bucket i with bucket i.  You pay one
shuffle at WRITE time, once, instead of two shuffles per JOIN for the
life of the data.

Spark-native mechanics used here (no custom machinery):
  * ``DataFrameWriter.bucketBy(n, key).sortBy(key)`` + ``saveAsTable``
    (bucket metadata lives in the catalog; an explicit ``path`` makes
    the table external so the data sits where we choose);
  * reading via ``spark.table`` restores the hash-partitioning
    property, and Catalyst drops the Exchange on both join sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Write ``df`` bucketed by ``key`` as external table ``table``.

    One repartition on the bucket key first, so each bucket is written
    by exactly one task (fewer, larger files — the layout you want on
    an object store; at 100 TB pick n_buckets so each bucket file
    lands in the 128 MB–1 GB range)."""
    (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its partitioning property intact."""
    return spark.table(table)
