"""Streaming-specific behavior not covered by the oracle-parity suite:
the foreachBatch scoring sink round-trip (the idiomatic replacement of
the reference's driver-side Cassandra loop, spark_to_cassandra.py)."""

from __future__ import annotations

import pytest
from pyspark.ml import Pipeline
from pyspark.ml.classification import DecisionTreeClassifier
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.sources.sinks import scan_predictions, sink_predictions
from network_ids_using_pyspark_spark.sources.tables import load_table
from network_ids_using_pyspark_spark.streaming.stream import score_to_sink, stream_events

from .conftest import SF_DIR


def test_score_to_sink_roundtrip(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="event_type", outputCol="encoded_label"),
            VectorAssembler(inputCols=["value", "user_id"], outputCol="features"),
            DecisionTreeClassifier(
                featuresCol="features", labelCol="encoded_label", seed=7
            ),
        ]
    )
    model = pipe.fit(events)

    sink = str(tmp_path / "predictions")
    ckpt = str(tmp_path / "ckpt")
    q = score_to_sink(stream_events(spark, SF_DIR), model, sink, ckpt)
    q.awaitTermination()

    back = scan_predictions(spark, sink)
    assert back.count() == events.count()
    assert back.columns == ["vals", "prediction"]
    n_classes = events.select("event_type").distinct().count()
    preds = {r[0] for r in back.select("prediction").distinct().collect()}
    assert preds <= set(range(n_classes))


def test_sink_rejects_wrong_schema(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("vals"))  # missing 'prediction'
    with pytest.raises(ValueError, match="prediction"):
        sink_predictions(df, str(tmp_path / "p"))
