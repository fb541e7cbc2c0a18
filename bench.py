#!/usr/bin/env python
"""Benchmark harness: runs every registered engine query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is materialized through the ``noop`` datasource sink —
full computation, no driver transfer, no column-pruning shortcut that
``count()`` would allow.
"""

from __future__ import annotations

import json
import os
import sys
import time

from network_ids_using_pyspark_spark.queries import REGISTRY
from network_ids_using_pyspark_spark.session import get_spark


def main() -> None:
    # The driver machine-parses stdout as ONE JSON line (BENCH_r01's
    # `parsed` was null — stray stdout broke it).  Everything incidental
    # — warmup chatter, Spark/py4j prints, failure notes — goes to
    # stderr; the real stdout is reserved for the final JSON line.
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        payload = _run()
    finally:
        sys.stdout = real_stdout
    print(json.dumps(payload), file=real_stdout, flush=True)


def _run() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="nids-bench", cpus=cpus, shuffle_partitions=cpus)

    # Warmup: touch every fixture table once so JVM/JIT/file-index costs
    # don't land on whichever query happens to run first.
    from network_ids_using_pyspark_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn, _ = REGISTRY[name]
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # a failing query gets a sentinel, not a crash
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)

    # --- BASELINE comparison (BASELINE.md): engine pipeline vs a direct
    # transcription of the reference's operator sequence, same data.
    pipeline: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SKIP_BASELINE") != "1":
        from pyspark.ml.classification import DecisionTreeClassifier

        from network_ids_using_pyspark_spark.ml.pipeline import prepare_flow_features
        from network_ids_using_pyspark_spark.operators.sampling import (
            anti_join_split,
            hash_sample,
        )
        from network_ids_using_pyspark_spark.plans.reference_transcription import (
            reference_style_pipeline,
        )
        from network_ids_using_pyspark_spark.sources.synthetic import synth_flows

        n_rows = max(2_000, int(6_000_000 * float(sf)))
        try:
            t0 = time.monotonic()
            prepared = prepare_flow_features(synth_flows(spark, n_rows))
            val = hash_sample(prepared, "flow_id", 0.1, seed="bench")
            train = anti_join_split(prepared, val, "flow_id")
            model = DecisionTreeClassifier(
                featuresCol="features", labelCol="encoded_label", seed=1234
            ).fit(train)
            model.transform(val).select("encoded_label", "prediction").write.format(
                "noop"
            ).mode("overwrite").save()
            pipeline["engine_pipeline_dt_sec"] = round(time.monotonic() - t0, 3)

            t0 = time.monotonic()
            reference_style_pipeline(synth_flows(spark, n_rows)).write.format(
                "noop"
            ).mode("overwrite").save()
            pipeline["reference_transcription_dt_sec"] = round(time.monotonic() - t0, 3)
            pipeline["speedup_vs_reference"] = round(
                pipeline["reference_transcription_dt_sec"]
                / max(pipeline["engine_pipeline_dt_sec"], 1e-9),
                3,
            )
        except Exception as e:
            print(f"bench: pipeline comparison FAILED: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        "n_queries": len(timings),
        "pipeline_baseline_comparison": pipeline,
    }
    spark.stop()
    return payload


if __name__ == "__main__":
    main()
