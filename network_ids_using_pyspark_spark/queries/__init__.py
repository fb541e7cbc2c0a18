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


# The driver's correctness gate covers the FIRST 50 registry entries
# (registration order); round 1 certified the original first 50
# (CORRECTNESS_r01.json), so round 2 front-loads everything the driver
# has not yet certified: new queries, ml, streaming, similarity,
# multimodal, functions_ext, the relational_ext tail, and the two
# reshaped queries (except_*, embedding_near_dup) whose round-1 rows
# are stale.  Every entry NOT listed here keeps its relative order
# after the listed ones — nothing is ever dropped.
_ROUND_PRIORITY = [
    # new this round
    "scan_flows_csv_profile",
    "random_split_invariants",
    "ml_e2e_ref_width",
    # ml (rows-only; driver-unchecked in r1)
    "ml_train_rf",
    "ml_train_dt",
    "ml_train_nb",
    "ml_train_mlp",
    "ml_confusion_rf",
    "flows_port_label_profile",
    # streaming
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_stats",
    "stream_dedup_count",
    "stream_stateful_user_stats",
    "stream_score_sink_roundtrip",
    "stream_static_join_counts",
    "stream_stream_join_pairs",
    # similarity / ANN
    "cosine_topk",
    "embedding_label_centroid_norms",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "mllib_minhash_pairs",
    # flagship composite takes the window slot of the weaker rows-only
    # MLlib twin (mllib_ann_topk rotates to round 3): a full-oracle row
    # for the five-stage pipeline is stronger driver evidence
    "corpus_e2e_pipeline",
    # multimodal
    "media_image_features",
    "media_audio_features",
    "media_resize_thumbs",
    "media_frame_samples",
    # functions_ext
    "lag_value_delta",
    "range_frame_hour_sum",
    "pivot_user_event_counts",
    "json_props_stats",
    "semi_join_discounted_orders",
    "multi_distinct_lineitem",
    "dense_hourly_counts",
    "quantile_profile",
    "value_histogram",
    "orders_by_month",
    "promo_parts_by_brand",
    "window_rank_functions",
    "user_event_sequences",
    "customer_name_features",
    "lineitem_unpivot_measures",
    "event_time_parts",
    # relational_ext tail + reshaped queries
    "asof_last_click_before_purchase",
    "q3_top_unshipped_revenue",
    "salted_user_counts",
    "argmax_aggregates",
    "feature_corr_matrix",
    "except_customers_no_urgent_orders",
    "embedding_near_dup",
    # --- 50-entry window boundary ---
    # Round-3 rotation candidates (driver-uncertified after round 2):
    # the 7 deferred relational_ext entries below, plus everything
    # registered after the round-2 window was frozen —
    # interval_join_window_stats, doc_chunks, repetition_profile,
    # pii_scrub_audit, vocab_coverage_profile, cms_heavy_hitters,
    # bloom_semi_join_lineitem, user_value_trend, media_phash_near_dup,
    # stream_doc_quality, recordlog_roundtrip_profile,
    # group_median_center, stream_dedup_against_corpus,
    # lang_balanced_sample, value_outliers_3sigma
    # (all green in the local sf0.001/sf0.01 mirror).
    "left_outer_order_fill",
    "full_outer_user_activity",
    "corr_qty_price",
    "global_top_orders",
    "orders_above_cust_avg",
    "lineitem_above_global_avg",
    "rollup_daily_from_hourly",
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
