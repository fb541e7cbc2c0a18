"""Passage-level cross-corpus dedup query (Gopher/CCNet line-dedup
analog — see operators/passages.py).  Output = the scrub audit for
every affected document: passage counts before/after, surviving token
count, and the rebuilt text (bit-compared against the oracle's
string_agg reassembly, so the order-restoring rebuild is certified,
not just the counts).

Non-vacuous by construction: the documents fixture contains exact
duplicate docs, whose every 8-token window has doc-frequency ≥ 2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.passages import passage_scrub
from ..sources.tables import load_table
from . import register

P = 8
MAX_DOCS = 1

_SCRUB_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 1
), pass AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(ceil(len(w) / {P}.0) AS BIGINT)),
           i -> struct_pack(pos := i, p := w[(i*{P}+1):(i*{P}+{P})])
         )) AS s
  FROM toks
), hashed AS (
  SELECT doc_id, s.pos AS pos, s.p AS p,
         md5(array_to_string(s.p, ' ')) AS h
  FROM pass
), bad AS (
  SELECT h FROM (
    SELECT h, COUNT(DISTINCT doc_id) AS df FROM hashed GROUP BY h
  ) WHERE df > {MAX_DOCS}
), flagged AS (
  SELECT doc_id, pos, p, h NOT IN (SELECT h FROM bad) AS keep FROM hashed
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       CAST(COALESCE(SUM(len(p)) FILTER (WHERE keep), 0) AS INTEGER) AS n_tokens_after,
       COALESCE(string_agg(array_to_string(p, ' '), ' ' ORDER BY pos)
                FILTER (WHERE keep), '') AS text_after
FROM flagged
GROUP BY doc_id
HAVING SUM(CASE WHEN keep THEN 0 ELSE 1 END) > 0
"""


@register("passage_dedup_scrub", _SCRUB_SQL)
def q_passage_dedup_scrub(spark, sf_dir):
    """Docs touched by the boilerplate scrub, with their rebuilt text.
    Two hash-keyed shuffles + one per-doc rebuild — O(total passages),
    never quadratic."""
    docs = load_table(spark, sf_dir, "documents")
    out = passage_scrub(docs, passage_len=P, max_docs=MAX_DOCS)
    return out.filter(F.col("n_removed") > 0).select(
        "doc_id",
        "n_passages",
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_tokens_after").cast("int").alias("n_tokens_after"),
        "text_after",
    )


_XC_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 1
), pass AS (
  SELECT doc_id, source,
         unnest(list_transform(
           range(0, CAST(ceil(len(w) / {P}.0) AS BIGINT)),
           i -> md5(array_to_string(w[(i*{P}+1):(i*{P}+{P})], ' '))
         )) AS h
  FROM toks
), idx AS (
  SELECT DISTINCT h FROM pass WHERE CAST(substring(source, 4) AS INTEGER) < 10
), flagged AS (
  SELECT DISTINCT doc_id FROM pass
  WHERE CAST(substring(source, 4) AS INTEGER) >= 10
    AND h IN (SELECT h FROM idx)
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quarantined
FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
WHERE CAST(substring(d.source, 4) AS INTEGER) >= 10
GROUP BY d.source
"""


@register("cross_corpus_dedup_report", _XC_SQL)
def q_cross_corpus_dedup_report(spark, sf_dir):
    """Batch ingestion hygiene: incoming sources (src10+) are screened
    against the passage-window index of the existing corpus (src0-9) —
    per-source quarantine counts.  Window granularity means a re-crawl
    with a new header still hits the index on its unchanged windows
    (whole-doc fingerprints — and this fixture has zero exact cross-
    source dup texts — would make the check vacuous).

    Scale: the index is a distinct 16-byte-hash relation; the screen is
    a semi-join on that hash (shuffle moves hash+doc_id, never text),
    then one per-source count."""
    from ..operators.passages import corpus_window_index, cross_corpus_quarantine

    docs = load_table(spark, sf_dir, "documents")
    src_idx = F.expr("CAST(substring(source, 4) AS INT)")
    corpus = docs.filter(src_idx < 10)
    incoming = docs.filter(src_idx >= 10)
    flagged = cross_corpus_quarantine(
        incoming, corpus_window_index(corpus, passage_len=P), passage_len=P
    ).withColumnRenamed("doc_id", "flagged_id")
    return (
        incoming.join(flagged, incoming.doc_id == F.col("flagged_id"), "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("flagged_id").isNotNull().cast("long")).alias("n_quarantined"),
        )
    )
