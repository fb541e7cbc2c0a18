"""Constructed-case unit tests for fuzzy-dedup operators: the
semantic guarantees that hold at any scale (identical content ⇒
identical sketch; disjoint content ⇒ no candidate pair)."""

from __future__ import annotations

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog tonight"),  # near dup
    (4, "completely different words about spark execution engines"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_identical_docs_identical_signatures(spark):
    sigs = {r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(16))
            for r in minhash_signatures(_docs(spark)).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    # near-dup shares most permutation mins
    agree = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree >= 8  # true jaccard ≈ 0.78 → expect most mins shared


def test_identical_docs_identical_simhash(spark):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
    assert fps[1] == fps[2]
    ham_near = bin(fps[1] ^ fps[3]).count("1")
    ham_far = bin(fps[1] ^ fps[4]).count("1")
    assert ham_near <= ham_far  # near-dup at most as many flipped bits


def test_jaccard_pairs_exact_dup_is_one(spark):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in jaccard_pairs(_docs(spark), 0.4).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) not in pairs and (2, 4) not in pairs
    assert 0.4 <= pairs[(1, 3)] < 1.0


def test_lsh_finds_exact_dup(spark):
    cands = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(minhash_signatures(_docs(spark))).collect()}
    assert (1, 2) in cands  # identical signatures always collide
    assert (1, 4) not in cands
