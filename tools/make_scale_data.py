#!/usr/bin/env python
"""Synthetic scale-up generator for SCALING_EVIDENCE.md (VERDICT r5
ask #3): replicate the driver fixture at ``--base`` (default sf0.1)
``k`` times with consistent key offsets, deliberate key skew, and
content perturbation, writing a `load_table`-compatible directory
(e.g. ``/tmp/nids_scaling/sf1.0``).

Design:

* **Referential integrity per replica** — every key column in replica
  ``i`` gets the same ``i * 10_000_000`` offset, so customer→orders→
  lineitem and part/supplier joins hold within each replica and the
  fact/dimension cardinalities scale together (dimension tables scale
  too, exactly as TPC-H scale factors do).
* **Skewed synthetic keys** — in replicas ``i ≥ 1`` a hash-chosen ~5%
  of orders remap ``o_custkey`` to replica-0's customer 1, ~5% of
  lineitems remap ``l_partkey`` to part 1, and ~5% of events remap
  ``user_id`` to user 1.  At k=10 the hot keys each hold ~4.5% of the
  fact table vs ~0.007% uniform — the skew that AQE skew-join and the
  engine's salting paths must absorb.
* **Content perturbation** — replicated documents rotate their token
  order by ``7·i`` (new shingles → replicas are NOT trivial exact/
  near duplicates, so dedup candidate structure grows linearly, not
  quadratically-by-construction); embeddings rotate dimensions by
  ``i``.  Timestamps are left as-is: a larger scale factor means a
  busier system in the same wall-clock window, which is how event
  density actually grows.

Nothing here touches /root/testdata (read-only).  Deterministic: no
RNG, all choices are md5-hash driven.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from network_ids_using_pyspark_spark.functions.hashing import hash_bucket  # noqa: E402
from network_ids_using_pyspark_spark.session import get_spark  # noqa: E402

OFF = 10_000_000  # per-replica key stride (far above any base key)
SKEW_PCT = 5  # % of replica fact rows remapped to the hot key


def _skewed(col: str, i: int, seed: str, hot: int = 1):
    """Offset ``col`` by replica stride, except a hash-chosen SKEW_PCT%
    which collapse onto the replica-0 hot key."""
    bucket = hash_bucket(F.col(col).cast("string"), 100, seed=f"{seed}:{i}:")
    return (
        F.when(bucket < SKEW_PCT, F.lit(hot))
        .otherwise(F.col(col) + F.lit(i * OFF))
        .alias(col)
    )


def _rotate_array(col, shift_expr):
    """Rotate an array column left by ``shift`` (SQL-side, no UDF)."""
    return F.expr(
        f"concat(slice({col}, {shift_expr} + 1, size({col}) - {shift_expr}), "
        f"slice({col}, 1, {shift_expr}))"
    )


def replica(df: DataFrame, table: str, i: int) -> DataFrame:
    if i == 0:
        return df
    if table == "customer":
        return df.withColumn("c_custkey", F.col("c_custkey") + i * OFF)
    if table == "supplier":
        return df.withColumn("s_suppkey", F.col("s_suppkey") + i * OFF)
    if table == "part":
        return df.withColumn("p_partkey", F.col("p_partkey") + i * OFF)
    if table == "orders":
        return df.select(
            (F.col("o_orderkey") + i * OFF).alias("o_orderkey"),
            _skewed("o_custkey", i, "skew-cust"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    if table == "lineitem":
        return df.select(
            (F.col("l_orderkey") + i * OFF).alias("l_orderkey"),
            _skewed("l_partkey", i, "skew-part"),
            (F.col("l_suppkey") + i * OFF).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
    if table == "events":
        return df.select(
            (F.col("event_id") + i * OFF).alias("event_id"),
            "ts",
            _skewed("user_id", i, "skew-user"),
            "event_type", "value", "props",
        )
    if table == "documents":
        shift = 7 * i
        toks = F.split(F.col("text"), r"\s+")
        rotated = F.array_join(
            _rotate_array("toks", f"pmod({shift}, greatest(size(toks), 1))"), " "
        )
        return (
            df.withColumn("toks", toks)
            .select(
                (F.col("doc_id") + i * OFF).alias("doc_id"),
                rotated.alias("text"),
                "lang", "source",
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
    if table == "embeddings":
        return df.select(
            (F.col("vec_id") + i * OFF).alias("vec_id"),
            _rotate_array(
                "embedding", f"pmod({i}, greatest(size(embedding), 1))"
            ).alias("embedding"),
            "label",
        )
    raise ValueError(table)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/nids_scaling/sf1.0")
    ap.add_argument("-k", type=int, default=10, help="replication factor")
    args = ap.parse_args()

    spark = get_spark(app_name="make-scale-data")
    fact_tables = ["orders", "lineitem", "events", "documents", "embeddings",
                   "customer", "supplier", "part"]
    os.makedirs(args.out, exist_ok=True)
    for t in ("region", "nation"):  # global dimensions: never replicated
        spark.read.parquet(f"{args.base}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied", flush=True)
    for t in fact_tables:
        base = spark.read.parquet(f"{args.base}/{t}.parquet")
        out = replica(base, t, 0)
        for i in range(1, args.k):
            out = out.unionByName(replica(base, t, i))
        out.repartition(32).write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: {n} rows ({args.k}x)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
