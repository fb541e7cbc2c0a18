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
from . import trainprep  # noqa: E402,F401
from . import entity  # noqa: E402,F401
from . import assoc  # noqa: E402,F401
from . import stats_ext  # noqa: E402,F401
from . import tokenizer  # noqa: E402,F401
from . import rangescale  # noqa: E402,F401
from . import quality_ext  # noqa: E402,F401
from . import geo  # noqa: E402,F401
from . import attribution  # noqa: E402,F401
from . import causal_ext  # noqa: E402,F401


# The driver's correctness gate covers the FIRST 50 registry entries
# (registration order).  Rounds 1-8 windowed 388 distinct entries
# (CORRECTNESS_r01-r08.json); the ONLY red ever recorded is r8's
# funnel_click_to_purchase — an oracle-side type bug (the registry's
# sole uncast integer SUM, HUGEINT in DuckDB), fixed this round with a
# BIGINT cast and re-windowed at the HEAD per VERDICT r8 ask #1; the
# engine side was judge-verified bit-exact at both SFs.
# tests/test_oracle_types.py now gates the whole registry against
# HUGEINT/DECIMAL oracle columns so this class cannot recur.
#
# Round 10's window executes VERDICT r9 asks #1 and #5:
#   - slots 1-26: the LAST 26 never-driver-certified entries (all 26
#     independently judge-verified bit-exact at sf0.01 in the r9
#     verdict session) — the functions_ext/relational leftovers,
#     clustering, rows-only MLlib minhash, the quality tail, and geo.
#     After this window the never-certified backlog is ZERO.
#   - slot 27: word2vec_cooc_synonyms, NEW this round (ask #5): the
#     oracle-checked algorithmic twin of the rows-only MLlib
#     word2vec_synonyms (cosine over exact co-occurrence count
#     vectors, queries/text.py) — certify it on arrival.
#   - slots 28-50: START of the oldest-green RE-certification (r7
#     ask #6 / r8 ask #5): the first 23 r1-certified entries in
#     registry order (flagship/profile/cleaning/sampling families) —
#     their only green predates the current AQE/shuffle/warmup
#     session config.
# Every entry NOT listed keeps its relative order after the listed
# ones — nothing is ever dropped.
#
# RENAME LEDGER (so coverage audits don't double-count): r2 renamed
# except_customers_without_orders -> except_customers_no_urgent_orders
# (same query; the r1 PASS belongs to the old name).
#
# ROUND-11 ROTATION PLAN (for the next builder; verify against
# CORRECTNESS_r10 first): finish the oldest-green re-certification —
# the remaining 25 r1-latest entries, oldest-first in registry order:
# dedup_exact, token_stats, text_quality, doc_fingerprint,
# lang_histogram, lang_id_predict, dedup_keep_best,
# corpus_ngram_counts, top_terms_per_doc, pandas_udf_fingerprint,
# corpus_filter_pipeline, mllib_tfidf_norms, doc_winnow_fingerprints,
# dedup_ngram_jaccard, minhash_signatures, minhash_lsh_pairs,
# simhash_fingerprints, simhash_near_dup, minhash_dedup_verified,
# dedup_clusters, rollup_returnflag_status, cube_priority_status,
# grouping_sets_events, union_split_halves, intersect_active_users
# (25 slots); spend the remaining ~25 on the r2-era greens,
# oldest-first (CORRECTNESS_r02.json order).
_ROUND_PRIORITY = [
    "salted_user_counts",
    "new_vs_returning_customers",
    "interorder_gap_histogram",
    "json_props_stats",
    "value_histogram",
    "orders_by_month",
    "promo_parts_by_brand",
    "user_event_sequences",
    "customer_name_features",
    "lineitem_unpivot_measures",
    "event_time_parts",
    "map_funcs_user_type_counts",
    "try_arith_safe_ratios",
    "bitwise_event_type_mask",
    "array_set_ops_profile",
    "event_type_trigrams",
    "dwell_time_by_type",
    "conversion_latency_quantiles",
    "episode_follow_counts",
    "mllib_minhash_pairs",
    "dbscan_grid_clusters",
    "kcenter_coreset_select",
    "c4_line_filter_report",
    "kn_bigram_score",
    "geo_grid_neighbor_pairs",
    "geo_grid_knn_suppliers",
    "word2vec_cooc_synonyms",
    "flagship_event_profile",
    "label_histogram",
    "distinct_labels",
    "count_distinct_labels",
    "profile_max",
    "profile_min",
    "q1_pricing_summary",
    "segment_order_stats",
    "nation_revenue",
    "top_parts_per_brand",
    "user_rolling_value",
    "rank_events_per_user",
    "sessionize_events",
    "profile_nan_counts",
    "replace_inf_fixed",
    "replace_inf_with_max",
    "impute_median_exact",
    "drop_null_rows",
    "hash_sample_orders",
    "anti_join_split_orders",
    "stratified_hash_sample_events",
    "add_row_id",
    "stratified_sample_events",
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
