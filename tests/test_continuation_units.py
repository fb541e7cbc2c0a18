"""Unit tests for the continuation-session operators: semantics pinned
against small hand-checkable inputs and independent Python models
(complementing the DuckDB oracle's engine-vs-engine check)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.fuzzy import edit1_pairs
from network_ids_using_pyspark_spark.operators.graphops import lpa_labels
from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_edit1_pairs_finds_all_edit_types(spark):
    """Substitution, insertion, and deletion neighbors are all found;
    distance-2 strings are not."""
    names = spark.createDataFrame(
        [("cat",), ("car",), ("cart",), ("at",), ("dog",)], ["nm"]
    )
    got = {
        (r.nm_a, r.nm_b): r.edit_pos for r in edit1_pairs(names).collect()
    }
    # canonical order is nm_a < nm_b
    assert got[("car", "cat")] == 3  # substitution at position 3
    assert ("car", "cart") in got and got[("car", "cart")] is None  # insertion
    assert ("at", "cat") in got and got[("at", "cat")] is None  # deletion
    assert ("cart", "cat") in got  # non-adjacent insertion
    assert ("cat", "dog") not in got  # distance 3
    assert ("at", "car") not in got  # distance 2


def test_edit1_pairs_exact_set(spark):
    """The full pair set equals a brute-force levenshtein check."""
    vals = ["abc", "abd", "ab", "abcd", "xyz", "xy", "zzz"]
    names = spark.createDataFrame([(v,) for v in vals], ["nm"])

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b)
        for i, a in enumerate(vals)
        for b in vals[i + 1 :]
        if lev(*sorted((a, b))) == 1
    }
    want = {tuple(sorted(p)) for p in want}
    got = {(r.nm_a, r.nm_b) for r in edit1_pairs(names).collect()}
    assert got == want


def test_lpa_two_cliques(spark):
    """Two DISCONNECTED triangles: min-tiebreak synchronous LPA
    converges each to its smallest member id in 2 supersteps, and
    labels never cross components."""
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
    und = tri1 + tri2
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], ["src", "dst"]
    )
    labels = {r.node: r.lbl for r in lpa_labels(edges, iters=2).collect()}
    assert labels == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"
    }


def test_assoc_rules_manual_case(spark):
    """lift/confidence verified by hand on the fixture's own output."""
    df = REGISTRY["assoc_rules_lift"][0](spark, SF_DIR)
    rows = df.collect()
    assert rows, "support floor too high for fixture"
    from network_ids_using_pyspark_spark.sources.tables import load_table

    items = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_baskets = items.select("l_orderkey").distinct().count()
    for r in rows[:5]:
        assert r.conf_a_b == r.sup_pair / r.sup_a
        assert r.conf_b_a == r.sup_pair / r.sup_b
        assert math.isclose(
            r.lift, r.sup_pair * n_baskets / (r.sup_a * r.sup_b), rel_tol=1e-12
        )
        assert r.sup_pair <= min(r.sup_a, r.sup_b)


def test_seasonal_wape_definition(spark):
    """WAPE recomputed from the same joined cells in plain Python."""
    df = REGISTRY["seasonal_naive_wape"][0](spark, SF_DIR)
    for r in df.collect():
        assert r.wape == r.sum_abs_err / r.sum_actual
        assert r.n_cells > 0


def test_dp_noise_reproducible_and_centered(spark):
    """Seeded noise: identical across invocations; magnitudes consistent
    with Laplace scale 1 (99% of draws within ~5 scale units)."""
    fn = REGISTRY["dp_noisy_daily_counts"][0]
    a = {(r.event_type, r.epoch_day): r.noisy_n for r in fn(spark, SF_DIR).collect()}
    b = {(r.event_type, r.epoch_day): r.noisy_n for r in fn(spark, SF_DIR).collect()}
    assert a == b
    devs = [
        abs(r.noisy_n - r.true_n)
        for r in fn(spark, SF_DIR).collect()
    ]
    assert sum(d <= 5.0 for d in devs) / len(devs) > 0.95
    assert any(d > 0.01 for d in devs)  # noise actually applied


def test_bigram_lm_independent_model(spark):
    """Mean log-loss re-derived by an independent Python bigram LM on a
    tiny in-memory corpus (same smoothing), to 1e-5."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),
            (2, "a b c"),
            (3, "c c c c"),
        ],
        ["doc_id", "text"],
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        # reuse the registered query against the temp dir: only the
        # documents table is read
        out = {
            r.doc_id: (r.n_bigrams, r.mean_logloss_bits)
            for r in REGISTRY["bigram_lm_logloss"][0](spark, d).collect()
        }
    corpus = {1: "a b a b a".split(), 2: "a b c".split(), 3: "c c c c".split()}
    from collections import Counter

    cb: Counter = Counter()
    cu: Counter = Counter()
    vocab = set()
    for toks in corpus.values():
        vocab.update(toks)
        for x, y in zip(toks, toks[1:]):
            cb[(x, y)] += 1
            cu[x] += 1
    v = len(vocab)
    for doc_id, toks in corpus.items():
        logs = [
            round(math.log2((cb[(x, y)] + 0.5) / (cu[x] + 0.5 * v)), 6)
            for x, y in zip(toks, toks[1:])
        ]
        want = -sum(logs) / len(logs)
        n, got = out[doc_id]
        assert n == len(logs)
        assert abs(got - want) < 1e-5


def test_hybrid_rrf_fusion_math(spark):
    """Fused score recomputed from the reported ranks."""
    df = REGISTRY["hybrid_search_rrf"][0](spark, SF_DIR)
    for r in df.collect():
        want = 0.0
        if r.bm25_rank > 0:
            want += 1.0 / (60 + r.bm25_rank)
        if r.ql_rank > 0:
            want += 1.0 / (60 + r.ql_rank)
        assert abs(r.rrf - round(want, 6)) <= 1e-9


def test_revenue_mix_effects_sum_to_delta(spark):
    """The decomposition identity: volume + price + cross == ΔRev."""
    rows = REGISTRY["revenue_mix_decomposition"][0](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        delta = r.rev_b - r.rev_a
        total = r.volume_effect + r.price_effect + r.cross_effect
        assert abs(total - delta) < 1e-3, (r.segment, total, delta)


def test_kaplan_meier_monotone_decreasing(spark):
    rows = sorted(
        REGISTRY["kaplan_meier_repeat_purchase"][0](spark, SF_DIR).collect(),
        key=lambda r: r.t_days,
    )
    assert rows
    surv = [r.survival for r in rows]
    assert all(0.0 < s2 <= s1 <= 1.0 for s1, s2 in zip(surv, surv[1:]))
    assert all(r.at_risk >= r.d_events > 0 for r in rows)


def test_rfm_cells_cover_all_customers(spark):
    from network_ids_using_pyspark_spark.sources.tables import load_table

    rows = REGISTRY["rfm_segment_counts"][0](spark, SF_DIR).collect()
    n_cust = (
        load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(1 <= r.r_sc <= 5 and 1 <= r.f_sc <= 5 and 1 <= r.m_sc <= 5 for r in rows)
