"""Benchmark-decontamination queries (training-data hygiene surface).

The fixture has no designated benchmark table, so the benchmark set is
a deterministic corpus slice (``doc_id % 37 == 1`` — 14 docs at every
SF), and the training corpus is everything else.  n=3 shingles with a
``min_overlap=3`` quarantine threshold gives a discriminative,
non-vacuous split at every SF (sf0.01: 94 quarantined / 392 clean;
sf0.1: 4491 / ~55k) — cf. VERDICT r1 on vacuous oracles.

Oracle SQL mirrors the Spark expression tree term-for-term (same
tokenization regex, same 3-token slices, same distinct-per-doc rule).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.decontam import decontaminate, overlap_report
from ..sources.tables import load_table
from . import register

N = 3
MIN_OVERLAP = 3
_BENCH_MOD, _BENCH_REM = 37, 1

# Same shingle CTE family as queries/dedup.py: DuckDB list slices are
# INCLUSIVE (w[i:i+2] = 3 tokens), range(a, b) excludes b.
_DECONTAM_CTE = f"""
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' ')))) AS shingle
  FROM toks WHERE len(w) >= {N}
), bench_grams AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = {_BENCH_REM}
), hits AS (
  SELECT s.doc_id, COUNT(*) AS n_overlap_grams
  FROM sh s JOIN bench_grams USING (shingle)
  WHERE s.doc_id % {_BENCH_MOD} <> {_BENCH_REM}
  GROUP BY s.doc_id
  HAVING COUNT(*) >= {MIN_OVERLAP}
)
"""

_REPORT_SQL = f"WITH {_DECONTAM_CTE} SELECT doc_id, n_overlap_grams FROM hits"

_CLEAN_SQL = f"""
WITH {_DECONTAM_CTE}
SELECT d.lang AS lang,
       COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM documents d
LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {_BENCH_MOD} <> {_BENCH_REM} AND h.doc_id IS NULL
GROUP BY d.lang
"""


def _split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == _BENCH_REM)
    corpus = docs.filter(F.col("doc_id") % _BENCH_MOD != _BENCH_REM)
    return corpus, bench


@register("decontam_overlap_report", _REPORT_SQL)
def q_decontam_overlap_report(spark, sf_dir):
    """Which training docs overlap the benchmark, and by how many
    distinct 3-grams — the audit artifact of the decontamination gate.
    Benchmark gram set broadcast; corpus side one agg on doc_id."""
    corpus, bench = _split(spark, sf_dir)
    return overlap_report(corpus, bench, n=N, min_overlap=MIN_OVERLAP)


@register("decontam_clean_profile", _CLEAN_SQL)
def q_decontam_clean_profile(spark, sf_dir):
    """Per-language profile of the surviving clean corpus after the
    quarantine anti-join — what actually ships to training."""
    corpus, bench = _split(spark, sf_dir)
    clean = decontaminate(corpus, bench, n=N, min_overlap=MIN_OVERLAP)
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
