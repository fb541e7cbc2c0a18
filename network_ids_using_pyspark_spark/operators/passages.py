"""Passage-level cross-corpus deduplication — the Gopher/CCNet
"line dedup" hygiene step, adapted to newline-free corpora: documents
are split into consecutive fixed-length token windows ("passages"), and
any passage occurring in more than ``max_docs`` distinct documents is
boilerplate — scrubbed from EVERY document, with the surviving passages
reassembled in order.

Dataflow (all relational, scale-linear):
  1. map-side: tokenize, window into ceil(len/P) passages, fingerprint
     each with md5 — one posexplode, no shuffle yet;
  2. one shuffle: distinct (passage_hash, doc_id) → doc-frequency per
     hash (map-side partial distinct first);
  3. the boilerplate hash set joins back against the exploded passages
     (left-anti).  Its size is data-dependent, so the join is a plain
     shuffle-hash by default — at 100 TB the hash relation is 16 bytes
     a row and the join key is the hash itself, so this is the cheap
     kind of shuffle; pass ``broadcast_boilerplate=True`` when the
     caller knows the boilerplate set is small;
  4. one groupBy doc_id with an order-restoring array_sort rebuild.

Never quadratic; shuffle volume is O(total passages), keys are 32-char
hashes, text bodies only cross the wire inside the final per-doc
rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens


def exploded_passages(
    docs: DataFrame,
    passage_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, passage_hash, passage_toks) — consecutive
    non-overlapping token windows; the final window may be short."""
    toks = tokens(text_col)
    n_pass = F.ceil(F.size(toks) / F.lit(passage_len)).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_pass - 1),
        lambda i: F.slice(toks, i * passage_len + 1, passage_len),
    )
    return (
        docs.filter(F.size(toks) >= 1)
        .select(F.col(id_col), F.posexplode(windows).alias("pos", "passage_toks"))
        .withColumn("passage_hash", F.md5(F.concat_ws(" ", "passage_toks")))
    )


def boilerplate_hashes(passages: DataFrame, max_docs: int = 1) -> DataFrame:
    """Passage hashes seen in more than ``max_docs`` distinct docs."""
    return (
        passages.select("passage_hash", "doc_id")
        .distinct()
        .groupBy("passage_hash")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") > max_docs)
    )


def passage_scrub(
    docs: DataFrame,
    passage_len: int = 8,
    max_docs: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_boilerplate: "bool | None" = None,
) -> DataFrame:
    """Per-doc scrub result: (doc_id, n_passages, n_removed,
    n_tokens_after, text_after) with cross-corpus boilerplate passages
    removed and survivors re-joined in original order.

    ``broadcast_boilerplate`` (VERDICT r2 #9): ``None`` (default) lets
    AQE pick at runtime from the boilerplate set's ACTUAL size — the
    auto-threshold, and the right call because that size is
    corpus-dependent (∝ duplicated passages, unknowable at plan time).
    ``True`` forces the broadcast (when the caller knows the set is
    tiny and wants to skip the shuffle even with AQE off); ``False``
    pins the shuffle join (boilerplate-heavy corpora where a broadcast
    would flirt with the driver limit)."""
    ex = exploded_passages(docs, passage_len=passage_len,
                           text_col=text_col, id_col=id_col)
    bad = boilerplate_hashes(ex, max_docs=max_docs).select("passage_hash")
    if broadcast_boilerplate is True:
        bad = F.broadcast(bad)
    elif broadcast_boilerplate is False:
        bad = bad.hint("shuffle_merge")
    kept_flag = ex.join(
        bad.withColumnRenamed("passage_hash", "bad_hash"),
        ex.passage_hash == F.col("bad_hash"),
        "left",
    ).select(
        id_col,
        "pos",
        "passage_toks",
        F.col("bad_hash").isNull().alias("keep"),
    )
    rebuilt = kept_flag.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("keep"), F.struct("pos", "passage_toks"))
            )
        ).alias("kept"),
    )
    survivors = F.flatten(F.transform("kept", lambda s: s.passage_toks))
    return rebuilt.select(
        id_col,
        "n_passages",
        "n_removed",
        F.size(survivors).alias("n_tokens_after"),
        F.concat_ws(" ", survivors).alias("text_after"),
    )


def corpus_window_index(corpus: DataFrame, passage_len: int = 8,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct passage-window fingerprints of an EXISTING corpus — the
    dedup index an ingestion pipeline maintains.  16-byte-key relation,
    size O(corpus tokens / passage_len); at 100 TB this lives as a
    bucketed table keyed on the hash so incoming batches co-locate."""
    return (
        exploded_passages(corpus, passage_len=passage_len,
                          text_col=text_col, id_col=id_col)
        .select("passage_hash")
        .distinct()
    )


def cross_corpus_quarantine(
    incoming: DataFrame,
    index: DataFrame,
    passage_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ids of INCOMING documents sharing at least one passage window
    with the indexed corpus — the batch twin of
    ``queries/streaming.py::stream_dedup_against_corpus``, at passage
    (not whole-doc) granularity: a re-crawl that prepends a header or
    splices boilerplate still hits the index on its unchanged windows.

    Scale shape: semi-join on the 16-byte hash (shuffle carries hash +
    doc_id only), then a distinct on doc_id — never moves text."""
    ex = exploded_passages(incoming, passage_len=passage_len,
                           text_col=text_col, id_col=id_col)
    return (
        ex.join(index, "passage_hash", "left_semi")
        .select(id_col)
        .distinct()
    )
