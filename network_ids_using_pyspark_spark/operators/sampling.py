"""Sampling and split operators.

The reference's train/validation split is the scaling anti-pattern trio
(SURVEY.md §4.2): a global ``row_number`` over ``Window().orderBy(lit(…))``
(all rows through ONE task, ``modelling.py:83-84``), a driver ``collect``
of ~10% of all row ids (``:91``), and a NOT-IN filter whose plan literal
holds millions of ids (``:93``).  None of that survives 100 TB.

Engine design:
* row ids — hash of the primary key (distributed, deterministic) or
  ``monotonically_increasing_id`` (no shuffle) when any unique id will do.
* sampling — pure filters on a portable hash (engine-independent,
  oracle-checkable, reproducible) plus Spark's seeded ``sampleBy`` for
  statistical sampling.
* split subtraction — ``left_anti`` join, broadcast when the sample side
  is small; zero driver traffic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

_GRAIN = 1_000_000


def add_row_id(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Engine op ``add_row_id`` (SURVEY.md §2.5 W1, fixed).

    With ``key_cols`` (a unique key): deterministic 60-bit hash id —
    stable across runs/partitionings, no shuffle, no single-task window.
    Without: ``monotonically_increasing_id`` — unique but run-dependent.
    """
    if key_cols:
        id_col = portable_hash64(F.concat_ws("\x1f", *key_cols))
    else:
        id_col = F.monotonically_increasing_id()
    return df.withColumn("row_id", id_col)


def _hash_frac(key: Column | str, seed: str) -> Column:
    return F.pmod(portable_hash64(key, seed), F.lit(_GRAIN))


def hash_sample(df: DataFrame, key_col: str, fraction: float, seed: str = "s0") -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose portable key
    hash lands under the threshold.  A pure filter → pushdown-friendly,
    identical membership on any engine or cluster size."""
    return df.filter(_hash_frac(key_col, seed) < int(fraction * _GRAIN))


def stratified_hash_sample(
    df: DataFrame, strata_col: str, key_col: str, fractions: dict[str, float], seed: str = "s0"
) -> DataFrame:
    """Deterministic per-stratum sample — the reproducible analog of the
    reference's ``sampleBy('Label', fractions, seed=0)``
    (``modelling.py:86-89``).  Strata missing from ``fractions`` get 0.
    A CASE-WHEN threshold keeps it a single codegen'd filter."""
    h = _hash_frac(key_col, seed)
    thr: Column = F.lit(0)
    for stratum, frac in fractions.items():
        thr = F.when(F.col(strata_col) == stratum, int(frac * _GRAIN)).otherwise(thr)
    return df.filter(h < thr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], seed: int = 0
) -> DataFrame:
    """Engine op ``stratified_sample`` (SURVEY.md §2.6 T1): Spark's
    per-stratum Bernoulli ``sampleBy`` — exactly the reference call, but
    the seed is mandatory.  Rows-only checked (membership is Spark-
    version-specific, SURVEY.md §7.3)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def anti_join_split(df: DataFrame, sample: DataFrame, key_col: str) -> DataFrame:
    """Engine op ``anti_join_split`` (SURVEY.md §2.4 J1): complement of a
    sample = ``left_anti`` join on the key.  The sample side is
    broadcast when small (Catalyst/AQE decides; ~10% of keys at 100 TB →
    shuffled anti-join, which is still the right plan — never a
    driver-collected NOT-IN list)."""
    return df.join(sample.select(key_col), on=key_col, how="left_anti")


def random_split(
    df: DataFrame, weights: list[float], seed: int
) -> list[DataFrame]:
    """Engine op ``random_split`` (SURVEY.md §2.6 T2) — seeded, unlike the
    reference's bare ``randomSplit`` (``ISAA_Review_3.ipynb:900``)."""
    return df.randomSplit(weights, seed=seed)
