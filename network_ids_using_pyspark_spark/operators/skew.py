"""Explicit skew-salted join — the manual mitigation for hot join keys.

AQE's skew-join splitting (on, and pinned by tests/test_plans.py::
test_aqe_splits_skewed_join) handles most skew at runtime, but two
cases still want the explicit form at 100 TB: (a) skew in the BUILD of
an aggregation-after-join where AQE's split happens too late to help
the downstream partial agg, and (b) engines/configs where AQE is
disabled for plan-stability reasons.  The technique: the fact side
gets a deterministic salt in [0, S), the other side is replicated S
ways (explode over sequence), and the join key becomes (key, salt) —
each hot key's rows spread over S tasks.

The salt is derived from the portable hash of fact-row content, NOT
from rand(): deterministic under retry/speculative execution (a
rand() salt can change on task rerun and silently drop/duplicate
rows — the classic correctness bug in hand-salted joins).

Correctness contract: the salted join's result set is IDENTICAL to the
plain join's — which is exactly how the registered query is
oracle-checked (the oracle runs the plain join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import portable_hash64


# Join types for which the salted result is identical to the plain
# join.  Right/full outer are rejected: each UNMATCHED row of the
# replicated side would be emitted n_salt times (matched rows join
# exactly one salt value; unmatched rows survive per-copy).
_SAFE_HOW = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
    "cross",
}


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    on: str,
    n_salt: int,
    salt_src: Column,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` with ``other`` on column ``on``, spreading each
    join key over ``n_salt`` sub-keys.  ``salt_src`` must be a
    deterministic per-row expression over fact columns (NOT rand()).
    Replication cost: ``other`` is scanned into S copies — keep S
    modest (8-32) and the replicated side the smaller one.

    ``how`` is restricted to join types that preserve the plain-join
    contract (see ``_SAFE_HOW``); outer joins that keep the replicated
    side raise."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of the "
            f"replicated side would be duplicated n_salt times; supported: "
            f"{sorted(_SAFE_HOW)}"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(portable_hash64(salt_src), F.lit(n_salt)).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_fact.join(replicated, [on, "_salt"], how).drop("_salt")


def spread_scan(df):
    """Repartition a relation to cluster parallelism IFF its scan
    arrived with fewer splits than cores.

    Small parquet files are one split each (and byte-range splitting
    cannot subdivide a single row group), so a map stage that fans each
    input row out — per-row portable-hash evaluation, D²-fold outer
    products, weight explodes — runs SERIALLY however many cores the
    cluster has.  For those map-heavy heads, one cheap shuffle of the
    small input buys full parallelism (r11: the PCA covariance 16.7 s →
    0.3 s warm).  At real scale the scan already has ≥cores splits and
    this is a NO-OP — the guard is what keeps the plan scale-honest
    (never add a shuffle a big scan doesn't need).  Only worth applying
    where per-input-row map cost is large; a cheap map stage flows into
    its first exchange at scan parallelism just fine.

    All engine aggregates downstream are order-free (exact decimal /
    hash-keyed), so repartitioning never moves a bit.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
