"""Distributed mergeable sketches (SURVEY.md §2 engine additions —
"novel sketch" family).

A count-min sketch expressed RELATIONALLY: the counter matrix is a
(d × w)-row DataFrame built with one grouped aggregation, so it
inherits Spark's map-side combine, AQE, and fault tolerance instead of
living in driver memory (contrast ``df.stat.countMinSketch``, which
collects the sketch to the driver).  d and w stay small (d ~ 4 hash
rows, w ~ 64-4096 buckets) ⇒ the counter relation is broadcastable by
construction, and estimation is a broadcast equi-join — no shuffle of
the probe side beyond its own aggregation.

Because the bucket hash is the portable md5 primitive
(``functions/hashing.py``), the whole sketch — counters AND estimates —
is bit-reproducible in the DuckDB oracle: the standard CMS guarantee
(estimate ≥ true count; error ≤ N/w with prob 1-(1/2)^d) is *checked*,
not assumed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash_bucket


def cms_counters(
    df: DataFrame, col: str, d: int = 4, w: int = 64, seed: str = "cms"
) -> DataFrame:
    """Build the d×w counter relation: one row per (hash_row, bucket)
    with the count of items landing there.  One union of d map-side
    projections + one grouped agg — the scan dominates; the output is
    d·w rows regardless of input size (the point of a sketch)."""
    parts = [
        df.select(
            F.lit(i).alias("h"),
            hash_bucket(col, w, seed=f"{seed}{i}").alias("bucket"),
        )
        for i in range(d)
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.groupBy("h", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    probes: DataFrame,
    counters: DataFrame,
    col: str,
    d: int = 4,
    w: int = 64,
    seed: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every probe row: min over the d
    counters the item hashes to.  The counter relation is broadcast
    (d·w rows), so the probe side never shuffles for the lookup —
    only for its own final (probe-keyed) min aggregation."""
    keep = list(probes.columns)
    parts = [
        probes.select(
            *keep,
            F.lit(i).alias("h"),
            hash_bucket(col, w, seed=f"{seed}{i}").alias("bucket"),
        )
        for i in range(d)
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    joined = u.join(F.broadcast(counters), ["h", "bucket"])
    return joined.groupBy(*keep).agg(F.min("c").alias("cms_est"))


def bloom_bits(
    df: DataFrame, col: str, k: int = 3, m: int = 4096, seed: str = "bloom"
) -> DataFrame:
    """Bloom filter of ``df[col]`` as a ONE-ROW relation holding the
    sorted array of set bit positions (k portable hashes per key, m
    positions).  m is chosen small enough that the array broadcasts —
    the relational analog of broadcasting java.util.BitSet, minus the
    driver round-trip ``df.stat.bloomFilter`` would take."""
    parts = [
        df.select(hash_bucket(col, m, seed=f"{seed}{i}").alias("pos"))
        for i in range(k)
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.agg(F.sort_array(F.collect_set("pos")).alias("__bloom_bits"))


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_col: str,
    key_col: str,
    k: int = 3,
    m: int = 4096,
    seed: str = "bloom",
) -> DataFrame:
    """Semi-join accelerated by a Bloom prefilter: the fact side is
    filtered MAP-SIDE (array_contains over the broadcast bit array for
    all k hashes — no shuffle, no candidate explosion), then the exact
    left-semi join runs over survivors only.  No false negatives ⇒ the
    result equals the plain semi-join bit-for-bit; the Bloom pass just
    removes ~(1-fpr) of non-matching fact rows before the shuffle —
    at 100 TB that's the difference between shuffling the full fact
    table and shuffling ~the matching fraction.

    (Spark's runtime row-group/bloom pushdown covers simple cases; this
    operator makes the pattern explicit, tunable, and usable where AQE
    won't inject it — e.g. ahead of aggregations or UDF stages.)"""
    bits = bloom_bits(keys, key_col, k=k, m=m, seed=seed)
    cond = None
    for i in range(k):
        c = F.array_contains(
            F.col("__bloom_bits"), hash_bucket(fact_col, m, seed=f"{seed}{i}")
        )
        cond = c if cond is None else (cond & c)
    candidates = (
        fact.join(F.broadcast(bits))  # 1-row broadcast, no shuffle
        .filter(cond)
        .drop("__bloom_bits")
    )
    return candidates.join(
        keys.select(F.col(key_col).alias(fact_col)).distinct(),
        on=fact_col,
        how="left_semi",
    )
