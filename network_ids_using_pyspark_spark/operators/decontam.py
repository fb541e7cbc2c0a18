"""Benchmark decontamination — remove training documents that overlap
an evaluation/benchmark set by shared word n-grams.

The standard LLM-training hygiene step (the reference pipeline has no
equivalent; this is part of the engine's training-data surface): a
document is *contaminated* when it shares at least ``min_overlap``
distinct n-gram shingles with ANY benchmark document.  Contaminated
docs are quarantined; the rest form the clean training corpus.

Scale design (the part that matters at 100 TB):
  * The benchmark side is small by nature (eval suites are thousands of
    docs, not billions) — its distinct-gram set is broadcast, so the
    corpus scan never shuffles its exploded grams for the probe.  With
    ``broadcast_bench=False`` the same dataflow degrades gracefully to
    a shuffle-hash semi-join keyed on the gram string (the escape hatch
    if a benchmark's gram set outgrows the broadcast budget).
  * The corpus side stays map-side until the per-doc overlap count — a
    single aggregation keyed by doc_id, then a left-anti join back to
    the (narrow) documents relation.  No quadratic anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exploded_shingles


def benchmark_grams(bench: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct n-gram shingles of the benchmark set — the (small)
    build side of the contamination probe."""
    return exploded_shingles(bench, text_col=text_col, n=n).select("shingle").distinct()


def overlap_report(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(doc_id, n_overlap_grams) for every corpus doc sharing at least
    ``min_overlap`` distinct shingles with the benchmark set."""
    grams = benchmark_grams(bench, n=n)
    if broadcast_bench:
        grams = F.broadcast(grams)
    hits = exploded_shingles(docs, n=n).join(grams, "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_grams"))
        .filter(F.col("n_overlap_grams") >= min_overlap)
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The clean training corpus: ``docs`` minus contaminated rows
    (left-anti on the quarantine list — never materializes text on the
    shuffle, only doc_ids)."""
    bad = overlap_report(docs, bench, n=n, min_overlap=min_overlap,
                         broadcast_bench=broadcast_bench)
    return docs.join(bad.select("doc_id"), "doc_id", "left_anti")
