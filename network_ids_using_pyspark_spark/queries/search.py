"""Relevance-search queries: BM25 top-k retrieval over the corpus.

Query terms mix one selective token with two common ones so idf does
real work on the fixture (the word-soup vocabulary is small; 'dup'
appears in ~5% of docs, the others in ~80% — BM25 must rank the
selective-term docs on top for the result to hash-match).
"""

from __future__ import annotations

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
