"""Query registry: every engine op exposed through the driver contract.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
the equivalent ANSI SQL for the DuckDB oracle (or ``None`` for ops whose
semantics are not SQL-expressible — seeded Bernoulli sampling, ML model
training, custom stateful streaming — which the driver records as
rows-only checks).

Cross-engine reproducibility rules used throughout (see
``functions/numeric.py`` and ``functions/hashing.py``):
  * double SUM/AVG → exact DECIMAL accumulation, final cast to double;
  * anything hash-dependent → the portable md5-based hash;
  * query outputs never contain NaN/±Inf *values* (only counts of them) —
    cleaning ops exist precisely to strip those;
  * every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]

REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


from . import core  # noqa: E402,F401
from . import cleaning  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import functions_ext  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import ml  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import ingest  # noqa: E402,F401
from . import corpus_ext  # noqa: E402,F401
from . import sketch  # noqa: E402,F401
from . import pipeline_e2e  # noqa: E402,F401
from . import decontam  # noqa: E402,F401
from . import search  # noqa: E402,F401
from . import datamgmt  # noqa: E402,F401
from . import anomaly  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import passages  # noqa: E402,F401
from . import packing  # noqa: E402,F401
from . import pyapi  # noqa: E402,F401
from . import graph  # noqa: E402,F401


# The driver's correctness gate covers the FIRST 50 registry entries
# (registration order).  Round 1 certified the original first 50
# (CORRECTNESS_r01.json); round 2's window held the next 50, but no
# CORRECTNESS_r02.json was recorded, so round 3 front-loads the 41
# queries that have NEVER sat in a certified window (new round-3 ops,
# the post-freeze round-2 registrations, and the deferred
# relational_ext tail), then spends the 9 remaining slots
# re-certifying the highest-value round-2-window entries (flagship
# pipeline, ref-width ML, streaming, bucketed ANN) as insurance.
# Every entry NOT listed here keeps its relative order after the
# listed ones — nothing is ever dropped.
_ROUND_PRIORITY = [
    # --- new this round (training-data + IDS surfaces) ---
    "decontam_overlap_report",
    "decontam_clean_profile",
    "bm25_search_topk",
    "cdc_apply_latest",
    "hash_split_assignments",
    "event_rate_anomaly",
    "portscan_detection",
    # --- registered after the round-2 window froze ---
    "cluster_keep_best",
    "interval_join_window_stats",
    "user_value_trend",
    "value_outliers_3sigma",
    "user_value_ewma",
    "right_outer_customer_orders",
    "data_quality_report",
    "value_stats_by_type",
    "media_phash_near_dup",
    "mllib_ann_topk",
    "kmeans_cluster_profile",
    "stream_doc_quality",
    "stream_dedup_against_corpus",
    "stream_flow_bruteforce_alerts",
    "recordlog_roundtrip_profile",
    "doc_chunks",
    "repetition_profile",
    "pii_scrub_audit",
    "vocab_coverage_profile",
    "group_median_center",
    "lang_balanced_sample",
    "unigram_surprisal_score",
    "html_strip_audit",
    "cms_heavy_hitters",
    "bloom_semi_join_lineitem",
    "hll_distinct_check",
    "quantile_sketch_check",
    # --- deferred relational_ext tail (never windowed) ---
    "left_outer_order_fill",
    "full_outer_user_activity",
    "corr_qty_price",
    "global_top_orders",
    "orders_above_cust_avg",
    "lineitem_above_global_avg",
    "rollup_daily_from_hourly",
    # --- new this session (never certified) ---
    "q5_same_nation_revenue",
    "q18_large_volume_customers",
    "passage_dedup_scrub",
    "retention_cohorts",
    "incremental_agg_merge",
    "bucketed_colocated_join",
    "ann_recall_eval",
    "cosine_topk_lsh_multiprobe",
    "stream_cdc_apply_latest",
    # --- 50-entry window boundary ---
    # Next in line if the window ever widens: corpus_e2e_pipeline,
    # ml_e2e_ref_width, scan_flows_csv_profile, ml_train_*,
    # stream_tumbling_counts, cosine_topk_lsh/ivf (round-2 window —
    # re-certification insurance since no CORRECTNESS_r02 was
    # recorded; all green in the local sf0.01 mirror).
]


def _reorder_registry() -> None:
    missing = [n for n in _ROUND_PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list names unknown queries: {missing}"
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for name in _ROUND_PRIORITY:
        REGISTRY[name] = snapshot.pop(name)
    REGISTRY.update(snapshot)  # remaining entries keep relative order


_reorder_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
