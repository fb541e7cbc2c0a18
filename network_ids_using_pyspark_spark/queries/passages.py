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


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated-span extraction (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): find the
# maximal character spans that occur verbatim in MORE THAN ONE document.
# The suffix-array construction of the paper is replaced by the
# distributed-friendly equivalent: stride-1 k-gram fingerprints, a
# doc-frequency gate, and an islands-and-gaps run merge — same spans
# for any duplication of length >= the k-gram width, no global index.
# ---------------------------------------------------------------------------

_XS_K = 20  # k-gram width (chars): minimum detectable duplication
_XS_MIN = 50  # minimum reported span length (the paper's 50-char bar)

_XS_SQL = f"""
WITH grams AS (
  SELECT doc_id, i, substring(md5(substring(text, i, {_XS_K})), 1, 16) AS g
  FROM documents, UNNEST(range(1, length(text) - {_XS_K} + 2)) AS t(i)
  WHERE length(text) >= {_XS_K}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
marked AS (SELECT doc_id, i FROM grams JOIN dup USING (g)),
runs AS (
  SELECT doc_id, i,
         i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM marked
)
SELECT doc_id,
       CAST(MIN(i) AS BIGINT) AS span_start,
       CAST(MAX(i) - MIN(i) + {_XS_K} AS BIGINT) AS span_len
FROM runs GROUP BY doc_id, grp
HAVING MAX(i) - MIN(i) + {_XS_K} >= {_XS_MIN}
"""


@register("exact_substring_dup_spans", _XS_SQL)
def q_exact_substring_dup_spans(spark, sf_dir):
    """Maximal duplicated-coverage spans ≥ {min} chars: regions in
    which EVERY {k}-char gram also occurs in at least one other
    document.  (The standard gram-run approximation of suffix-array
    ExactSubstr: a merged span's neighboring grams may be duplicated
    against different partner docs, so the span as a whole need not
    have a single verbatim twin — each of its {k}-grams does.)

    Every stride-1 {k}-char gram is fingerprinted (md5/16 — the shuffle
    carries 16-byte keys, never text); grams whose doc-frequency is ≥ 2
    mark their start positions; consecutive marked positions merge into
    maximal spans with the islands-and-gaps trick (i − row_number is
    constant within a run).  Cross-doc only (within-doc repetition is
    `repetition_profile`'s job).

    Scale plan: the gram explode is map-side with factor ≈ doc length —
    the honest linear cost the paper's suffix array also pays; the
    doc-frequency gate is one grouped agg on the fingerprint; the run
    merge windows per doc_id (parallel across docs, never global)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _XS_K
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(text) - {_XS_K} + 1),"
                f" i -> substring(md5(substring(text, i, {_XS_K})), 1, 16))"
            )
        ).alias("p", "g"),
    ).select("doc_id", (F.col("p") + 1).alias("i"), "g")
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    marked = grams.join(dup, "g").select("doc_id", "i")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("i")
    runs = marked.withColumn("grp", F.col("i") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("i").cast("long").alias("span_start"),
            (F.max("i") - F.min("i") + _XS_K).cast("long").alias("span_len"),
        )
        .filter(F.col("span_len") >= _XS_MIN)
        .select("doc_id", "span_start", "span_len")
    )


q_exact_substring_dup_spans.__doc__ = q_exact_substring_dup_spans.__doc__.format(
    min=_XS_MIN, k=_XS_K
)


# ---------------------------------------------------------------------------
# Suffix-array construction by prefix doubling (Manber–Myers /
# Larsson–Sadakane) over a concatenated document sample — the PAPER
# algorithm behind ExactSubstr dedup, whose gram-run approximation is
# `exact_substring_dup_spans`.  Each level sorts positions by their
# first 2^j characters via (rank, rank-at-offset) re-ranking; the
# output is the per-level convergence profile: group counts, positions
# still tied, and the largest tie group.  A tie at level j certifies a
# repeated substring of length ≥ 2^j, so the profile brackets the
# longest repeat to a power-of-two band.
# ---------------------------------------------------------------------------

_SA_DOCS = 8  # deterministic sample: doc_id < 8 (~2.3k chars concatenated)
_SA_LEVELS = 13  # 2^13 = 8192 ≥ any plausible sample length → total order
_SA_SEP = 1  # chr(1) separator, absent from the corpus alphabet


def _sa_sql() -> str:
    parts = [
        f"""docs8 AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE doc_id < {_SA_DOCS}
),
strs AS MATERIALIZED (
  SELECT doc_id, text || chr({_SA_SEP}) AS t,
         SUM(length(text) + 1) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
  FROM docs8
),
pos AS MATERIALIZED (
  SELECT COALESCE(off, 0) + i AS p, substring(t, i, 1) AS c
  FROM strs, UNNEST(range(1, length(t) + 1)) AS ti(i)
),
r0 AS MATERIALIZED (SELECT p, DENSE_RANK() OVER (ORDER BY c) AS r FROM pos)"""
    ]
    for j in range(_SA_LEVELS):
        parts.append(
            f"""r{j + 1} AS MATERIALIZED (
  SELECT a.p, DENSE_RANK() OVER (ORDER BY a.r, COALESCE(b.r, 0)) AS r
  FROM r{j} a LEFT JOIN r{j} b ON b.p = a.p + {1 << j}
)"""
        )
    levels = "\nUNION ALL ".join(
        f"""SELECT CAST({j} AS INTEGER) AS level, CAST({1 << j} AS BIGINT) AS span,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_tied_pos,
       CAST(MAX(c) AS BIGINT) AS max_group
FROM (SELECT r, COUNT(*) AS c FROM r{j} GROUP BY r)"""
        for j in range(_SA_LEVELS + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + levels


@register("suffix_array_doubling_profile", _sa_sql())
def q_suffix_array_doubling_profile(spark, sf_dir):
    """Prefix-doubling suffix ranking over the chr(1)-joined text of
    the first {_SA_DOCS} documents: level j ranks every position by
    its first 2^j characters, re-ranking from (own rank, rank 2^j
    ahead, missing → 0).  Output is one row per level — distinct rank
    groups, positions in tied groups, largest group — down to the
    total order the distinct suffix lengths guarantee by the last
    level.  Ties surviving at level j certify a repeated substring of
    length ≥ 2^j somewhere in the sample.

    Scale plan: this IS the distributed suffix-array recipe — each of
    the O(log n) levels is one self-equi-join on position offset plus
    one sort-based re-rank.  The global ordering a dense_rank implies
    is the algorithm's essence, realized at 100 TB as a range-
    partitioned sort (Spark's sort shuffle) per level over (rank,
    next-rank) pairs — fixed-width keys, never text; the corpus text
    appears only in the level-0 single-character ranking.  Here the
    relation is sample-bounded so the single-partition window is
    harmless; ranks are localCheckpointed per level so the 13-level
    lineage never replays."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    docs8 = docs.filter(F.col("doc_id") < _SA_DOCS).select("doc_id", "text")
    woff = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    strs = docs8.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(chr(_SA_SEP))).alias("t"),
        F.sum(F.length("text") + 1).over(woff).alias("off"),
    )
    pos = (
        strs.select("t", "off", F.explode(F.sequence(F.lit(1), F.length("t"))).alias("i"))
        .select(
            (F.coalesce(F.col("off"), F.lit(0)) + F.col("i")).cast("long").alias("p"),
            F.expr("substring(t, i, 1)").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    ranks = pos.select(
        "p", F.dense_rank().over(Window.orderBy("c")).cast("long").alias("r")
    ).localCheckpoint(eager=False)
    profiles = []
    for j in range(_SA_LEVELS + 1):
        g = ranks.groupBy("r").agg(F.count(F.lit(1)).alias("c"))
        profiles.append(
            g.agg(
                F.lit(j).cast("int").alias("level"),
                F.lit(1 << j).cast("long").alias("span"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
                .cast("long")
                .alias("n_tied_pos"),
                F.max("c").cast("long").alias("max_group"),
            )
        )
        if j < _SA_LEVELS:
            gap = 1 << j
            b = ranks.select(
                (F.col("p") - gap).alias("bp"), F.col("r").alias("rr")
            )
            ranks = (
                ranks.join(b, ranks.p == b.bp, "left")
                .select(
                    "p",
                    F.dense_rank()
                    .over(Window.orderBy(F.col("r"), F.coalesce(F.col("rr"), F.lit(0))))
                    .cast("long")
                    .alias("r"),
                )
                .localCheckpoint(eager=False)
            )
    out = profiles[0]
    for pr in profiles[1:]:
        out = out.unionByName(pr)
    return out
