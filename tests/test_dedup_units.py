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


def test_simhash_near_dup_exact_dup_has_zero_hamming(spark):
    from network_ids_using_pyspark_spark.operators.dedup import simhash_near_dup_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(simhash(_docs(spark))).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical docs: identical fingerprint
    # banding guarantee: hamming < bands (=4) pairs are always candidates,
    # so a reported pair can never have hamming above the verify cap
    assert all(h <= 3 for h in pairs.values())


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe = n_centroids ⇒ IVF scans every inverted list ⇒ results
    must equal brute-force top-k exactly (the recall knob's ceiling)."""
    from network_ids_using_pyspark_spark.operators.similarity import (
        as_double_array,
        cosine_topk,
        cosine_topk_ivf,
    )
    from network_ids_using_pyspark_spark.sources.tables import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_vec_id"), as_double_array("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_vec_id"), as_double_array("embedding").alias("ce")
    )
    brute = {(r["q_vec_id"], r["rk"]): r["cand_vec_id"]
             for r in cosine_topk(q, c, k=3).collect()}
    ivf = {(r["q_vec_id"], r["rk"]): r["cand_vec_id"]
           for r in cosine_topk_ivf(q, c, k=3, n_centroids=4, nprobe=4).collect()}
    assert brute == ivf


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """Winnowing guarantee: a shared run of ≥ w+k-1 (=6) tokens must
    produce at least one shared fingerprint; disjoint docs share none."""
    from network_ids_using_pyspark_spark.operators.textops import winnow_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "prefix words alpha beta gamma delta epsilon zeta trailing"),
            (3, "utterly unrelated content with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 7-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_connected_components_transitive_closure(spark):
    """A~B and B~C must land in one component even though (A,C) was
    never emitted as a pair; disjoint pairs stay separate."""
    from network_ids_using_pyspark_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 8)], "doc_a long, doc_b long"
    )
    comp = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7}


def test_connected_components_matches_union_find(spark):
    """200 random edges vs a reference union-find — the distributed
    min-label fixpoint must produce exactly the canonical components."""
    import random

    rnd = random.Random(20260813)
    edges = [(rnd.randrange(120), rnd.randrange(120)) for _ in range(200)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(120))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    expected = {v: find(v) for v in touched}
    # canonical label = min node id in component
    comp_min = {}
    for v, r in expected.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[r] for v, r in expected.items()}

    from network_ids_using_pyspark_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == expected


def test_jaccard_spill_path_equivalent(spark, tmp_path):
    # spill_path (checkpoint-to-parquet, VERDICT r2 #9) must be
    # result-invisible: same pairs, same jaccard values as the
    # persisted path.
    base = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs(_docs(spark), 0.4).collect()}
    spilled = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in jaccard_pairs(
                   _docs(spark), 0.4, spill_path=str(tmp_path / "shingles")
               ).collect()}
    assert base == spilled
    import os
    assert any(f.endswith(".parquet") for f in os.listdir(tmp_path / "shingles"))


def test_passage_scrub_broadcast_modes_equivalent(spark):
    # broadcast tri-state (None=AQE auto / True=forced / False=pinned
    # shuffle) must never change results, only the physical join.
    from network_ids_using_pyspark_spark.operators.passages import passage_scrub

    docs = spark.createDataFrame(
        [(i, "shared boilerplate words repeated across documents here now "
             + f"unique tail {i} alpha beta gamma delta") for i in range(4)],
        "doc_id long, text string",
    )
    outs = []
    for mode in (None, True, False):
        rows = passage_scrub(docs, passage_len=8, broadcast_boilerplate=mode).collect()
        outs.append(sorted((r.doc_id, r.n_removed, r.text_after) for r in rows))
    assert outs[0] == outs[1] == outs[2]
