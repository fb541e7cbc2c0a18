"""network_ids_using_pyspark_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capability surface of
the reference repo ``Thejineaswar/Network-IDS-using-Pyspark`` (a batch
network-intrusion-detection pipeline over CICFlowMeter flow records; see
SURVEY.md).  Everything is DataFrame/SQL-first so Catalyst + Tungsten pick
the physical plan: predicate pushdown, column pruning, whole-stage codegen,
AQE.  Python UDFs are avoided entirely in the hot path; where Python is
genuinely needed (multimodal decode stubs) we use Arrow-batched
``mapInPandas``.

Layout:
    sources/    — scans (parquet/CSV flow records) and sinks (predictions)
    operators/  — relational, profiling, cleaning, sampling, window,
                  dedup, similarity, text operators
    functions/  — shared column-expression helpers (portable hash,
                  vector math, text utilities)
    ml/         — MLlib pipeline parity (assemble/scale/encode/train/
                  evaluate/confusion-matrix)
    streaming/  — Structured Streaming layer (watermark, windows,
                  stateful dedup, foreachBatch scoring sink)
    plans/      — plan-inspection helpers (explain capture, shuffle count)
"""

__version__ = "0.1.0"
