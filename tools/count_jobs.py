#!/usr/bin/env python
"""Deterministic optimization evidence: run a registry query twice
(warm-up + measured) and print the measured run's Spark JOB COUNT and
wall seconds.  Job counts are plan-structural — immune to box noise —
so before/after deltas prove a pass-elimination claim.

    python tools/count_jobs.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from network_ids_using_pyspark_spark.queries import REGISTRY  # noqa: E402
from network_ids_using_pyspark_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(
        app_name="nids-count-jobs",
        cpus=cpus,
        shuffle_partitions=cpus,
        # retain enough job infos for a full query's job-id listing
        extra_conf={"spark.ui.retainedJobs": "100000"},
    )
    from network_ids_using_pyspark_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).count()

    sc = spark.sparkContext
    for name in args.names:
        fn, _ = REGISTRY[name]
        # warm-up run (JIT, codegen caches)
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        group = f"count:{name}"
        sc.setJobGroup(group, name)
        t0 = time.monotonic()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"{name}: jobs={len(jobs)} wall={dt}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
