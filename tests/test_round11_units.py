"""Semantic unit tests for the round-11 additions: hard-negative
mining and corpus novelty attribution."""

from __future__ import annotations

import pandas as pd
import pytest

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_hard_negatives_are_cross_label_and_ranked(spark):
    rows = REGISTRY["hard_negative_mining_lsh"][0](spark, SF_DIR).collect()
    assert rows, "fixture corpus must yield at least one hard negative"
    by_q: dict = {}
    for r in rows:
        assert r["q_label"] != r["neg_label"]  # negatives only
        assert r["q_vec_id"] != r["cand_vec_id"]
        assert 1 <= r["rk"] <= 5
        assert -1.0 - 1e-9 <= r["sim"] <= 1.0 + 1e-9
        by_q.setdefault(r["q_vec_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        sims = [r["sim"] for r in rs]
        # rank order is similarity-descending (ties broken by cand id)
        assert sims == sorted(sims, reverse=True), (q, sims)
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))


def test_hard_negatives_subset_of_unfiltered_pairs(spark):
    """Every mined pair must also appear in the unfiltered multiprobe
    candidate set (hard-negative mining = same candidate generation +
    label filter, nothing more)."""
    from pyspark.sql import functions as F

    from network_ids_using_pyspark_spark.operators.dedup import hyperplanes
    from network_ids_using_pyspark_spark.operators.similarity import (
        as_double_array,
        cosine_topk_lsh,
    )
    from network_ids_using_pyspark_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_vec_id"), as_double_array("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_vec_id"), as_double_array("embedding").alias("ce")
    )
    # k large enough that the label filter can't promote a pair the
    # unfiltered ranking dropped
    all_pairs = {
        (r["q_vec_id"], r["cand_vec_id"])
        for r in cosine_topk_lsh(
            q, c, k=10**6, hyperplanes=hyperplanes(4, 64), probe_hamming=1
        ).collect()
    }
    mined = REGISTRY["hard_negative_mining_lsh"][0](spark, SF_DIR).collect()
    assert all((r["q_vec_id"], r["cand_vec_id"]) in all_pairs for r in mined)


def _write_docs(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["unit"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_doc_novelty_exact_duplicate_contributes_nothing(spark, tmp_path):
    """doc 2 is a verbatim copy of doc 1 → every one of its shingles
    first occurred in doc 1, so total novelty counts only doc 1's and
    doc 3's distinct grams."""
    t1 = "alpha beta gamma delta epsilon"
    t3 = "zeta eta theta iota kappa"
    sf = _write_docs(tmp_path, [t1, t1, t3])
    rows = REGISTRY["doc_novelty_fraction"][0](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    # 5 words -> 3 distinct trigram shingles per doc
    assert r["n_docs"] == 3
    assert r["total_grams"] == 9
    assert r["novel_grams"] == 6  # doc 2 adds zero novelty
    assert r["novelty_rate"] == pytest.approx(6 / 9, abs=1e-6)


def test_doc_novelty_all_unique_is_one(spark, tmp_path):
    sf = _write_docs(
        tmp_path, ["one two three four", "five six seven eight"]
    )
    r = REGISTRY["doc_novelty_fraction"][0](spark, sf).collect()[0]
    assert r["novel_grams"] == r["total_grams"] == 4
    assert r["novelty_rate"] == 1.0


def test_kcore_nodes_materializes_before_releasing_edge_cache(spark):
    """r11 optimization gate: kcore_nodes used to unpersist its edge
    cache during CONSTRUCTION — before any action had filled it — so
    the persist was dead weight and every peel superstep recomputed the
    edge build at the caller's first action.  Pin the fixed contract:
    with checkpoint=True the returned relation is already materialized
    (lineage cut to an RDD scan), values match the checkpoint=False
    lineage exactly, and no persisted RDD leaks out of the call."""
    from pyspark.sql import functions as F

    from network_ids_using_pyspark_spark.operators.graphops import kcore_nodes

    pairs = [
        (1, 2), (1, 3), (2, 3),          # triangle: the 2-core
        (3, 4), (4, 5),                  # tail: peeled at k=2
    ]
    df = spark.createDataFrame(pairs, "src long, dst long")
    edges = df.unionByName(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    got = kcore_nodes(edges, k=2, iters=4)
    # lineage is cut: the plan scans the checkpointed RDD, not the union
    # (localCheckpoint RDDs themselves stay registered until GC — that
    # is the same ContextCleaner-managed retention pagerank_int has)
    assert "LogicalRDD" in got._jdf.queryExecution().optimizedPlan().toString()
    want = sorted(r["node"] for r in kcore_nodes(edges, k=2, iters=4, checkpoint=False).collect())
    assert sorted(r["node"] for r in got.collect()) == want == [1, 2, 3]
