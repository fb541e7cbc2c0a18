"""Partitioned-parquet write + partition pruning: the layout decision
that turns a 100 TB scan into a one-partition read."""

from __future__ import annotations

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.plans.inspect import explain_str
from network_ids_using_pyspark_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    one = back.filter(F.col("event_type") == "purchase")

    plan = explain_str(one, "formatted")
    # the filter became a partition filter on the scan, not a row filter
    assert "PartitionFilters" in plan and "purchase" in plan
    assert one.count() == ev.filter(F.col("event_type") == "purchase").count()
    # full readback is lossless
    assert back.count() == ev.count()
