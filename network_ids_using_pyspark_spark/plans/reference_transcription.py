"""Faithful transcription of the reference pipeline — FOR BENCHMARKING.

This is the measurement baseline BASELINE.md prescribes ("a direct
PySpark transcription of the reference's operator sequence on the same
data/hardware"), deliberately preserving the reference's scaling
anti-patterns (SURVEY.md §4.2) so the engine's speedup is measured
against what the reference actually does:

* per-row Python UDF for ±Inf replacement (``modelling.py:61-67``)
* two collect() round-trips for the replacement max (``:65,68``)
* global ``Window().orderBy(lit(...))`` row numbering — every row
  through ONE task (``:83-84``)
* driver-collected sample ids + NOT-IN ``isin`` filter (``:91-93``)

It is NOT part of the engine's operator surface.  The engine-side
equivalent of this pipeline is ``ml.pipeline.prepare_flow_features`` +
hash split (queries ``ml_train_*``).
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.classification import DecisionTreeClassifier
from pyspark.ml.feature import Imputer, MinMaxScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def reference_style_pipeline(flows: DataFrame, seed: int = 0) -> DataFrame:
    """modelling.py's sequence, transcribed onto the synthetic flow
    fixture.  Returns the trained DT's predictions on the validation
    sample (forcing full execution)."""
    df = flows

    # --- UDF inf-replacement with collect()ed max (modelling.py:61-68)
    @F.udf(T.DoubleType())
    def replace_infs_udf(x, v):
        return float(v) if x is not None and np.isinf(x) else x

    mx = df.agg({"Flow Byts/s": "max"}).collect()[0][0]
    df = df.withColumn(
        "Flow Pkts/s", replace_infs_udf(F.col("Flow Pkts/s"), F.lit(4000000.0))
    )
    df = df.withColumn("Flow Byts/s", replace_infs_udf(F.col("Flow Byts/s"), F.lit(mx)))

    # --- median impute (modelling.py:74-76)
    df = Imputer(strategy="median", inputCols=["Flow Byts/s"], outputCols=["Flow Byts/s"]).fit(
        df
    ).transform(df)
    df = df.drop("Timestamp")

    # --- global row number over a literal order (modelling.py:83-84)
    w = Window().orderBy(F.lit("Dst Port"))
    df = df.withColumn("row_num", F.row_number().over(w))

    # --- stratified sample + driver-collected NOT-IN split (:86-93)
    labels = [r[0] for r in df.select("Label").distinct().collect()]
    sampled = df.sampleBy("Label", {l: 0.1 for l in labels}, seed=seed)
    sampled_ids = [r[0] for r in sampled.select("row_num").collect()]
    train = df.filter(~F.col("row_num").isin(sampled_ids))

    # --- assemble / scale / encode (:95-111)
    feature_cols = [
        c for c in train.columns if c not in ("Label", "row_num", "flow_id")
    ]
    train = train.na.drop()
    sampled = sampled.na.drop()
    va = VectorAssembler(inputCols=feature_cols, outputCol="independent_features")
    train, val = va.transform(train), va.transform(sampled)
    scaler = MinMaxScaler(inputCol="independent_features", outputCol="scaled_features").fit(train)
    train, val = scaler.transform(train), scaler.transform(val)
    idx = StringIndexer(inputCol="Label", outputCol="encoded_label").fit(train)
    train, val = idx.transform(train), idx.transform(val)

    # --- DT train + score (modelling.py:123-128)
    dt = DecisionTreeClassifier(
        featuresCol="independent_features", labelCol="encoded_label", seed=1234
    ).fit(train)
    return dt.transform(val).select("encoded_label", "prediction")
