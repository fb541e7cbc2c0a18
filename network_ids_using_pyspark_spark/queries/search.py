"""Relevance-search queries: BM25 top-k retrieval over the corpus.

Query terms mix one selective token with two common ones so idf does
real work on the fixture (the word-soup vocabulary is small; 'dup'
appears in ~5% of docs, the others in ~80% — BM25 must rank the
selective-term docs on top for the result to hash-match).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.search import bm25_topk, bm25_topk_sql
from ..sources.tables import load_table
from . import register

TERMS = ["dup", "stream", "merge"]
TOP_K = 20


@register("bm25_search_topk", bm25_topk_sql(TERMS, TOP_K))
def q_bm25_search_topk(spark, sf_dir):
    """BM25 top-20 for the query {dup, stream, merge}: map-side tf,
    one-row broadcast corpus stats, TakeOrderedAndProject top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, TERMS, k=TOP_K)


# ---------------------------------------------------------------------------
# ANN quality gate: recall@k of both approximate indexes vs the exact
# top-k, computed inside the engine (the eval every production ANN
# deployment runs before trusting an index).
# ---------------------------------------------------------------------------

_EVAL_K = 10


def _recall_sql(k: int = _EVAL_K) -> str:
    from .similarity import _brute_topk_sql, _ivf_topk_sql, _lsh_topk_sql

    return f"""
WITH exact AS ({_brute_topk_sql(k)}),
lsh AS ({_lsh_topk_sql(k)}),
mp AS ({_lsh_topk_sql(k, probe_hamming=1)}),
ivf AS ({_ivf_topk_sql(k=k)}),
hl AS (
  SELECT e.q_vec_id, COUNT(*) AS n FROM exact e
  JOIN lsh l ON e.q_vec_id = l.q_vec_id AND e.cand_vec_id = l.cand_vec_id
  GROUP BY e.q_vec_id
),
hm AS (
  SELECT e.q_vec_id, COUNT(*) AS n FROM exact e
  JOIN mp m ON e.q_vec_id = m.q_vec_id AND e.cand_vec_id = m.cand_vec_id
  GROUP BY e.q_vec_id
),
hi AS (
  SELECT e.q_vec_id, COUNT(*) AS n FROM exact e
  JOIN ivf i ON e.q_vec_id = i.q_vec_id AND e.cand_vec_id = i.cand_vec_id
  GROUP BY e.q_vec_id
)
SELECT e.q_vec_id,
       COUNT(*) AS n_exact,
       COALESCE(ANY_VALUE(hl.n), 0) AS n_lsh_hits,
       COALESCE(ANY_VALUE(hm.n), 0) AS n_mp_hits,
       COALESCE(ANY_VALUE(hi.n), 0) AS n_ivf_hits,
       CAST(COALESCE(ANY_VALUE(hl.n), 0) AS DOUBLE) / {k} AS recall_lsh,
       CAST(COALESCE(ANY_VALUE(hm.n), 0) AS DOUBLE) / {k} AS recall_lsh_multiprobe,
       CAST(COALESCE(ANY_VALUE(hi.n), 0) AS DOUBLE) / {k} AS recall_ivf
FROM exact e
LEFT JOIN hl ON e.q_vec_id = hl.q_vec_id
LEFT JOIN hm ON e.q_vec_id = hm.q_vec_id
LEFT JOIN hi ON e.q_vec_id = hi.q_vec_id
GROUP BY e.q_vec_id
"""


@register("ann_recall_eval", _recall_sql())
def q_ann_recall_eval(spark, sf_dir):
    """Per-query recall@10 of the sign-LSH and IVF indexes against the
    exact brute-force top-10.  All three rankings come from the same
    operators the standalone queries use; the ground-truth set is the
    expensive side and it's computed ONCE here — at 100 TB this runs on
    a sampled query set, never the full corpus, and the approximate
    sides stay bucket-pruned exactly as in production."""
    from ..operators.dedup import hyperplanes
    from ..operators.similarity import (
        as_double_array,
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_vec_id"), as_double_array("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_vec_id"), as_double_array("embedding").alias("ce")
    )
    exact = cosine_topk(q, c, k=_EVAL_K).select("q_vec_id", "cand_vec_id")
    lsh = cosine_topk_lsh(q, c, k=_EVAL_K, hyperplanes=hyperplanes(4, 64)).select(
        "q_vec_id", "cand_vec_id"
    )
    mp = cosine_topk_lsh(
        q, c, k=_EVAL_K, hyperplanes=hyperplanes(4, 64), probe_hamming=1
    ).select("q_vec_id", "cand_vec_id")
    ivf = cosine_topk_ivf(q, c, k=_EVAL_K, n_centroids=8, nprobe=2).select(
        "q_vec_id", "cand_vec_id"
    )

    def hits(approx, name):
        return (
            exact.join(approx, ["q_vec_id", "cand_vec_id"])
            .groupBy("q_vec_id")
            .agg(F.count(F.lit(1)).alias(name))
        )

    base = exact.groupBy("q_vec_id").agg(F.count(F.lit(1)).alias("n_exact"))
    out = (
        base.join(hits(lsh, "nl"), "q_vec_id", "left")
        .join(hits(mp, "nm"), "q_vec_id", "left")
        .join(hits(ivf, "ni"), "q_vec_id", "left")
        .select(
            "q_vec_id",
            "n_exact",
            F.coalesce("nl", F.lit(0)).alias("n_lsh_hits"),
            F.coalesce("nm", F.lit(0)).alias("n_mp_hits"),
            F.coalesce("ni", F.lit(0)).alias("n_ivf_hits"),
            (F.coalesce("nl", F.lit(0)).cast("double") / _EVAL_K).alias("recall_lsh"),
            (F.coalesce("nm", F.lit(0)).cast("double") / _EVAL_K).alias(
                "recall_lsh_multiprobe"
            ),
            (F.coalesce("ni", F.lit(0)).cast("double") / _EVAL_K).alias("recall_ivf"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Hybrid retrieval: RRF fusion of BM25 and Dirichlet query-likelihood.
# ---------------------------------------------------------------------------

from ..operators.search import hybrid_rrf_sql, hybrid_rrf_topk  # noqa: E402

_HY_K = 10
_HY_POOL = 50


@register("hybrid_search_rrf", hybrid_rrf_sql(TERMS, k=_HY_K, pool=_HY_POOL))
def q_hybrid_search_rrf(spark, sf_dir):
    """Reciprocal-rank fusion of two rankers over the same query —
    BM25 and a Dirichlet-smoothed query-likelihood LM — the classic
    hybrid-retrieval combiner for incomparable score scales (and the
    same shape used to fuse lexical with vector ANN rankings).  On the
    fixture the two rankers genuinely disagree (different top-1), so
    the fused ordering certifies real fusion, not a pass-through.

    Scale plan: one corpus scan computes both scores map-side off the
    shared 1-row stats broadcast; each pool cut is
    TakeOrderedAndProject; ranking windows and the fusion join touch
    ≤ pool rows.  No corpus-sized sort or window anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return hybrid_rrf_topk(docs, TERMS, k=_HY_K, pool=_HY_POOL)
