"""The flagship LLM-corpus preparation pipeline as ONE registered,
fully oracle-checked query: quality gate → exact dedup → fuzzy dedup
(MinHash-LSH verified) → chunking → mixture accounting.

This is the composition a user of the engine actually runs over 100 TB
of raw corpus; every stage is an operator certified individually
elsewhere, and this query certifies that they COMPOSE (the oracle
rebuilds the identical five-stage dataflow in one SQL chain).

Scale shape: quality gate and fingerprinting pipeline inside the scan;
exact dedup shuffles 16-byte fingerprints; the fuzzy stage is the
banded-LSH path (bucket-local candidates, verify touches candidates
only); chunking is map-side; the final mixture profile is a tiny agg.

Operational step 0 (not a stage of this query — explicit decision,
VERDICT r8 ask #7): run ``stop_shingle_profile`` (queries/dedup.py)
over the raw corpus first.  It prices the fuzzy stage before paying
for it — per-source heavy-shingle share under the df-split cutoff —
and a hot report means boilerplate stripping belongs BEFORE dedup.
It stays outside this query because the five-stage oracle is the
flagship regression canary: folding a side report in would change the
certified output contract and bill its jobs to every canary run.  See
SCALING.md "Round 9 — the stop-shingle pre-flight".
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import minhash_verified_pairs
from ..operators.textops import chunk_documents, doc_fingerprint, quality_score, token_count
from ..sources.tables import load_table
from . import register
from .dedup import BANDS, JACCARD_T, K, ROWS, _BASE_H, _SHINGLES_CTE, _bands_sql
from .text import _NTOK_SQL, _PUNCT_SQL, _STOPR_SQL, _STOPWORDS

_CW, _CS = 50, 40  # chunk window / stride


def _e2e_sql() -> str:
    from .dedup import _SIG_COLS

    quality = (
        f"(LEAST(CAST({_NTOK_SQL} AS DOUBLE) / 20.0, 1.0) * 0.4"
        f" + (1.0 - LEAST({_PUNCT_SQL} * 4, 1.0)) * 0.3"
        f" + LEAST({_STOPR_SQL} * 5, 1.0) * 0.3)"
    )
    # the shingle CTE is written against `documents`; re-root it at the
    # exact-deduped intermediate (same expressions, different source)
    shingles_on_kept = _SHINGLES_CTE.replace("FROM documents", "FROM kept")
    return rf"""
WITH scored AS (
  SELECT doc_id, lang, text, {_NTOK_SQL} AS n_tokens, {quality} AS quality
  FROM documents
),
filtered AS (
  SELECT doc_id, lang, text FROM scored WHERE quality >= 0.5 AND n_tokens >= 10
),
fps AS (
  SELECT doc_id, lang, text,
         substring(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16) AS fp
  FROM filtered
),
kept AS (
  SELECT doc_id, lang, text FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM fps
  ) WHERE doc_id = keeper
),
{shingles_on_kept},
hh AS (SELECT doc_id, {_BASE_H} AS h FROM sh),
sig AS (SELECT doc_id, {_SIG_COLS} FROM hh GROUP BY doc_id),
bands AS ({_bands_sql()}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
verified AS (
  SELECT doc_a, doc_b FROM (
    SELECT i.doc_a, i.doc_b,
           CAST(n_inter AS DOUBLE) / CAST(x.n_sh + y.n_sh - n_inter AS DOUBLE) AS jaccard
    FROM inter i JOIN sz x ON i.doc_a = x.doc_id JOIN sz y ON i.doc_b = y.doc_id
  ) WHERE jaccard >= {JACCARD_T}
),
survivors AS (
  SELECT k.doc_id, k.lang, k.text FROM kept k
  WHERE NOT EXISTS (SELECT 1 FROM verified v WHERE v.doc_b = k.doc_id)
),
ctoks AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w FROM survivors),
st AS (
  SELECT doc_id, lang, w,
         unnest(range(1, greatest(len(w) - {_CW} + {_CS}, 1) + 1, {_CS})) AS s
  FROM ctoks WHERE len(w) >= 1
),
chunks AS (
  SELECT doc_id, lang, CAST(least({_CW}, len(w) - s + 1) AS INTEGER) AS n_tokens
  FROM st
)
SELECT lang,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS total_chunk_tokens
FROM chunks
GROUP BY lang
"""


@register("corpus_e2e_pipeline", _e2e_sql())
def q_corpus_e2e_pipeline(spark, sf_dir):
    """Flagship composition: quality gate (score ≥ 0.5, ≥ 10 tokens) →
    exact dedup (min-doc_id keeper per content fingerprint) → fuzzy
    dedup (MinHash 16-perm → 4×4 banded LSH → exact Jaccard ≥ 0.5
    verify; the doc_b of every verified pair is dropped, keep-first) →
    token-window chunking (50/40) → per-language mixture profile.  One
    oracle certifies the whole five-stage dataflow end to end."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        token_count("text").alias("n_tokens"),
        quality_score("text", _STOPWORDS).alias("quality"),
    )
    filtered = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10)
    ).select("doc_id", "lang", "text")
    fps = filtered.withColumn("fp", doc_fingerprint("text"))
    kept = (
        fps.withColumn("keeper", F.min("doc_id").over(Window.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "lang", "text")
    )
    pairs = minhash_verified_pairs(
        kept, k=K, bands=BANDS, rows=ROWS, threshold=JACCARD_T
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = kept.join(drop, "doc_id", "left_anti")
    chunks = chunk_documents(survivors, window=_CW, stride=_CS)
    return (
        chunks.join(survivors.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("total_chunk_tokens"),
        )
    )
