"""Training-batch construction ops: sequence packing and temperature-
based mixture sampling — the last mile between a clean corpus and a
training run.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    hash_bucket,
    hash_bucket_sql,
    portable_hash64,
    portable_hash64_sql,
)
from ..operators.textops import word_token_count
from ..sources.tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Sequence packing: assign whole documents to ~N-token training
# sequences by prefix-sum budget bucketing, within hash-partitioned
# pack groups (packing is embarrassingly parallel across groups — the
# property that makes it work at 100 TB: no global order, no global
# state, each group packs independently).
# ---------------------------------------------------------------------------

_SEQ_TOKENS = 256
_PACK_GROUPS = 16
_PACK_SEED = "pack:v1:"

_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         {hash_bucket_sql('doc_id', _PACK_GROUPS, _PACK_SEED)} AS grp,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
  FROM documents
), packed AS (
  SELECT grp, doc_id, n_tok,
         CAST(floor((SUM(n_tok) OVER (PARTITION BY grp ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tok)
                    / {_SEQ_TOKENS}.0) AS BIGINT) AS seq_id
  FROM toks
)
SELECT grp, seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc_id
FROM packed
GROUP BY grp, seq_id
"""


@register("sequence_packing_profile", _PACK_SQL)
def q_sequence_packing_profile(spark, sf_dir):
    """Pack the corpus into ~256-token training sequences: documents
    are hash-split into {_PACK_GROUPS} independent pack groups, and
    within a group a prefix-sum over doc_id order assigns each doc to
    the sequence where its budget window starts (docs stay whole; a
    straddling doc belongs to the bin it starts in).  One window sort
    per group — bounded by group size, not corpus size; groups pack in
    parallel.  Output profiles every packed sequence."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        hash_bucket("doc_id", _PACK_GROUPS, seed=_PACK_SEED).alias("grp"),
        word_token_count("text").alias("n_tok"),
    )
    w = Window.partitionBy("grp").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.withColumn(
        "seq_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / float(_SEQ_TOKENS)).cast(
            "long"
        ),
    )
    return packed.groupBy("grp", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


# ---------------------------------------------------------------------------
# Percentile length-band filter: per-language p10/p90 character gates
# — the "too short / too long" corpus hygiene rule, with thresholds
# LEARNED from the data rather than hard-coded.
# ---------------------------------------------------------------------------

_BAND_LO, _BAND_HI = 0.1, 0.9

_BAND_SQL = f"""
WITH th AS (
  SELECT lang,
         quantile_cont(n_chars, {_BAND_LO}) AS p10,
         quantile_cont(n_chars, {_BAND_HI}) AS p90
  FROM documents GROUP BY lang
)
SELECT d.lang,
       ANY_VALUE(th.p10) AS p10,
       ANY_VALUE(th.p90) AS p90,
       CAST(SUM(CASE WHEN d.n_chars >= th.p10 AND d.n_chars <= th.p90
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COUNT(*) AS n_total
FROM documents d JOIN th ON d.lang = th.lang
GROUP BY d.lang
"""


@register("length_band_filter", _BAND_SQL)
def q_length_band_filter(spark, sf_dir):
    """Keep documents inside their language's [p10, p90] length band:
    exact interpolated percentiles per group (one sort-based aggregate
    over a tiny group count), thresholds broadcast back to a map-side
    filter — the full corpus is scanned once.  Both engines share the
    linear-interpolation percentile definition (certified by
    quantile_profile), so the thresholds are bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    th = docs.groupBy("lang").agg(
        F.percentile("n_chars", _BAND_LO).alias("p10"),
        F.percentile("n_chars", _BAND_HI).alias("p90"),
    )
    in_band = (F.col("n_chars") >= F.col("p10")) & (F.col("n_chars") <= F.col("p90"))
    return (
        docs.join(F.broadcast(th), "lang")
        .groupBy("lang")
        .agg(
            F.any_value("p10").alias("p10"),
            F.any_value("p90").alias("p90"),
            F.sum(in_band.cast("long")).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature sampling across sources (tau = 1/2): acceptance rate per
# source ∝ n^(tau-1) = 1/sqrt(n), normalized so the smallest source
# keeps everything — the standard multinomial temperature reweighting
# of multi-source training mixtures.
#
# tau = 1/2 on purpose: the acceptance ratio sqrt(n_min)/sqrt(n_i)
# uses only IEEE-754 correctly-rounded ops (sqrt, divide), so both
# engines compute bit-identical thresholds.  A general tau needs
# pow(), which is libm-dependent and NOT correctly rounded — at the
# bit-exact driver gate that's a latent flake, so the general-tau
# variant is deliberately not offered.
# ---------------------------------------------------------------------------

_TEMP_GRAIN = 1_000_000
_TEMP_SEED = "srctemp:"

_TEMP_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), scored AS (
  SELECT source, n, 1.0 / sqrt(CAST(n AS DOUBLE)) AS keep_w
  FROM counts
), thresholds AS (
  SELECT source, n,
         CAST(floor(keep_w / (SELECT MAX(keep_w) FROM scored) * {_TEMP_GRAIN}) AS BIGINT) AS thr
  FROM scored
)
SELECT t.source,
       ANY_VALUE(t.n) AS n_before,
       COUNT(*) FILTER (WHERE ({portable_hash64_sql('d.doc_id', _TEMP_SEED)} % {_TEMP_GRAIN}) < t.thr) AS n_after,
       ANY_VALUE(t.thr) AS thr
FROM documents d JOIN thresholds t ON d.source = t.source
GROUP BY t.source
"""


@register("source_temperature_sample", _TEMP_SQL)
def q_source_temperature_sample(spark, sf_dir):
    """Temperature-reweighted mixture (tau=1/2): acceptance rate per
    source ∝ 1/sqrt(n), so small sources are upweighted relative to
    their raw share (the smallest keeps everything).  Rates come from
    one tiny per-source aggregate (broadcast back); membership is the
    portable hash — deterministic, reproducible, no RNG state.  The
    full corpus is scanned once, map-side filtered."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    scored = counts.withColumn(
        "keep_w", F.lit(1.0) / F.sqrt(F.col("n").cast("double"))
    )
    max_w = scored.agg(F.max("keep_w").alias("mw"))
    thresholds = scored.crossJoin(F.broadcast(max_w)).select(
        "source",
        "n",
        F.floor(F.col("keep_w") / F.col("mw") * _TEMP_GRAIN).cast("long").alias("thr"),
    )
    kept = (
        portable_hash64("doc_id", seed=_TEMP_SEED) % _TEMP_GRAIN < F.col("thr")
    ).cast("long")
    return (
        docs.join(F.broadcast(thresholds), "source")
        .groupBy("source")
        .agg(
            F.any_value("n").alias("n_before"),
            F.sum(kept).alias("n_after"),
            F.any_value("thr").alias("thr"),
        )
    )
