"""Behavioral unit tests for the round-3 operators: decontamination,
BM25 retrieval, CDC apply-latest, hash split, anomaly/portscan — each
checked on hand-built inputs where the right answer is known a priori
(the registry parity tests cover the fixture-scale oracle matches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.decontam import (
    decontaminate,
    overlap_report,
)
from network_ids_using_pyspark_spark.operators.search import bm25_topk
from network_ids_using_pyspark_spark.queries import REGISTRY
from network_ids_using_pyspark_spark.sources.tables import load_table

from .conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- decontam

def test_decontam_quarantines_verbatim_copy(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps right over everything"),  # 3 shared 3-grams
            (2, "completely unrelated words about database engines here"),
        ],
    )
    rep = overlap_report(corpus, bench, n=3, min_overlap=3)
    assert [r.doc_id for r in rep.collect()] == [1]
    clean = decontaminate(corpus, bench, n=3, min_overlap=3)
    assert [r.doc_id for r in clean.collect()] == [2]


def test_decontam_partitions_corpus(spark):
    """clean ∪ quarantined == corpus, disjoint — on the real fixture."""
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 1)
    corpus = docs.filter(F.col("doc_id") % 37 != 1)
    rep = overlap_report(corpus, bench, n=3, min_overlap=3)
    clean = decontaminate(corpus, bench, n=3, min_overlap=3)
    n_corpus, n_rep, n_clean = corpus.count(), rep.count(), clean.count()
    assert n_rep + n_clean == n_corpus
    assert clean.join(rep, "doc_id").count() == 0


def test_decontam_broadcasts_benchmark_grams(spark):
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 1)
    corpus = docs.filter(F.col("doc_id") % 37 != 1)
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- bm25

def test_bm25_ranks_selective_term_first(spark):
    corpus = _docs(
        spark,
        [
            (1, "zebra stripes pattern analysis zebra zebra"),  # rare term, high tf
            (2, "common words common words common words zebra"),  # rare term, tf 1
            (3, "common words common words common words only"),
            (4, "more common words again and again and again"),
        ],
    )
    out = bm25_topk(corpus, ["zebra"], k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]  # docs without the term score 0
    assert out[0].bm25 > out[1].bm25


def test_bm25_topk_uses_ordered_limit(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = bm25_topk(docs, ["dup"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------- cdc

def test_cdc_latest_wins_and_tombstone_deletes(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "signup", 1.0),
            (2, "2024-01-02 00:00:00", 10, "purchase", 5.0),  # latest for 10
            (3, "2024-01-01 00:00:00", 20, "click", 2.0),
            (4, "2024-01-03 00:00:00", 20, "error", 0.0),  # tombstone for 20
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for t in ["events"]:
            ev.write.parquet(f"{d}/{t}.parquet")
        out = REGISTRY["cdc_apply_latest"][0](spark, d).collect()
    assert len(out) == 1
    assert out[0].user_id == 10 and out[0].last_event_type == "purchase"


def test_cdc_plan_is_single_agg_no_sort(spark):
    df = REGISTRY["cdc_apply_latest"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # argmax agg, not a windowed sort
    from network_ids_using_pyspark_spark.plans.inspect import count_shuffles

    assert count_shuffles(df) == 1


# ---------------------------------------------------------------- split

def test_hash_split_deterministic_and_total(spark):
    fn = REGISTRY["hash_split_assignments"][0]
    a = {r.split: (r.n_docs, r.sum_chars) for r in fn(spark, SF_DIR).collect()}
    b = {r.split: (r.n_docs, r.sum_chars) for r in fn(spark, SF_DIR).collect()}
    assert a == b
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(v[0] for v in a.values()) == n_docs
    assert set(a) == {"train", "val", "test"}
    assert a["train"][0] > a["val"][0] and a["train"][0] > a["test"][0]


# ---------------------------------------------------------------- passages

def test_passage_scrub_removes_shared_window_preserves_order(spark):
    from network_ids_using_pyspark_spark.operators.passages import passage_scrub

    shared = "a b c d e f g h"  # one exact 8-token window in both docs
    corpus = _docs(
        spark,
        [
            (1, f"{shared} unique tail one two three four five six"),
            (2, f"other head words here pad pad pad pad {shared}"),
            (3, "totally different content nothing shared at all here"),
        ],
    )
    out = {r.doc_id: r for r in passage_scrub(corpus, passage_len=8).collect()}
    assert out[1].n_removed == 1 and out[2].n_removed == 1
    assert out[3].n_removed == 0
    # survivors keep original order
    assert out[1].text_after == "unique tail one two three four five six"
    assert out[2].text_after == "other head words here pad pad pad pad"


def test_passage_scrub_keeps_within_doc_repeats(spark):
    from network_ids_using_pyspark_spark.operators.passages import passage_scrub

    rep = "x y z w x y z w"  # doc repeats its own window; df stays 1
    corpus = _docs(spark, [(1, f"{rep} {rep}"), (2, "entirely unrelated words")])
    out = {r.doc_id: r for r in passage_scrub(corpus, passage_len=8).collect()}
    assert out[1].n_removed == 0


# ---------------------------------------------------------------- tpch_ext

def test_q5_broadcasts_only_dims(spark):
    """nation/region broadcast; no cartesian or nested-loop anywhere."""
    df = REGISTRY["q5_same_nation_revenue"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q5_pushes_date_filter_to_orders_scan(spark):
    df = REGISTRY["q5_same_nation_revenue"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_q18_semi_join_reduces_before_wide_join(spark):
    df = REGISTRY["q18_large_volume_customers"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


# ---------------------------------------------------------------- datamgmt (r3b)

def test_retention_offset0_is_cohort_max(spark):
    """Week-0 activity counts every cohort member; later offsets can
    only lose users."""
    rows = REGISTRY["retention_cohorts"][0](spark, SF_DIR).collect()
    assert rows and all(r.week_offset >= 0 for r in rows)
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active_users
    for offsets in by_cohort.values():
        assert 0 in offsets
        assert all(v <= offsets[0] for v in offsets.values())


def test_incremental_merge_equals_full_recompute(spark):
    """The partial-state merge must equal a one-shot aggregate (the
    oracle asserts this bit-exactly; here: totals reconcile)."""
    from network_ids_using_pyspark_spark.sources.tables import load_table

    rows = REGISTRY["incremental_agg_merge"][0](spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == load_table(spark, SF_DIR, "orders").count()


# ---------------------------------------------------------------- ann eval

def test_ann_recall_multiprobe_dominates_single_probe(spark):
    """Multi-probe scores a superset of single-probe's buckets, so its
    recall can never be lower; IVF floors are empirical."""
    rows = REGISTRY["ann_recall_eval"][0](spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.recall_lsh_multiprobe >= r.recall_lsh
        assert 0.0 <= r.recall_lsh <= 1.0 and 0.0 <= r.recall_ivf <= 1.0
    mean_mp = sum(r.recall_lsh_multiprobe for r in rows) / len(rows)
    mean_sp = sum(r.recall_lsh for r in rows) / len(rows)
    mean_ivf = sum(r.recall_ivf for r in rows) / len(rows)
    assert mean_mp > mean_sp
    assert mean_ivf >= 0.7


# ---------------------------------------------------------------- bucketed

def test_bucketed_join_has_no_join_exchange(spark):
    """Both sides pre-bucketed on the order key: the only shuffle in
    the plan is the final aggregate — the join itself is co-located."""
    from network_ids_using_pyspark_spark.plans.inspect import count_shuffles

    df = REGISTRY["bucketed_colocated_join"][0](spark, SF_DIR)
    assert "SortMergeJoin" in df._jdf.queryExecution().executedPlan().toString()
    assert count_shuffles(df) == 1


# ---------------------------------------------------------------- pruning

def test_partition_pruned_scan_uses_partition_filters(spark):
    df = REGISTRY["partition_pruned_scan"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan or "PartitionFilters: [(o_year" in plan


# ---------------------------------------------------------------- anomaly

def test_portscan_flags_only_scanner_hosts(spark):
    out = REGISTRY["portscan_detection"][0](spark, SF_DIR).collect()
    assert len(out) > 0
    assert {r.src_id for r in out} <= {7, 13}
    assert all(r.n_ports >= 20 for r in out)


def test_rate_anomaly_flags_injected_spike(spark):
    import tempfile

    # 9 days x 24 rows/day for one type, then a 240-row spike on day 10
    base = spark.range(9 * 24).select(
        F.lit("click").alias("event_type"),
        (F.to_timestamp(F.lit("2024-03-01 00:00:00"))
         + F.make_interval(hours=F.col("id"))).alias("ts"),
    )
    spike = spark.range(240).select(
        F.lit("click").alias("event_type"),
        F.to_timestamp(F.lit("2024-03-10 12:00:00")).alias("ts"),
    )
    ev = base.unionAll(spike).select(
        F.monotonically_increasing_id().alias("event_id"),
        "ts",
        F.lit(1).alias("user_id").cast("long"),
        "event_type",
        F.lit(0.0).alias("value"),
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        rows = REGISTRY["event_rate_anomaly"][0](spark, d).collect()
    flagged = {r.day.date().isoformat() for r in rows if r.is_anomaly}
    assert "2024-03-10" in flagged
