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
# (registration order).  Rounds 1-6 windowed 292 distinct entries
# (CORRECTNESS_r01-r06.json; zero oracle mismatches ever recorded —
# the only non-null ``err`` values are the driver's ``no_oracle``
# marker on by-design rows-only entries).  Round 7's window executes
# VERDICT r6 ask #1: rotate onto 49 more never-certified entries
# (166 remained after r6), leading with the five round-6 additions
# that have never been driver-windowed, then the functions_ext
# window/interval tail, the relational_ext tail, the sampling/split
# family, the sketch gates, and the now-floor-self-asserting MLlib
# rows-only family (whose _METRIC_FLOORS raise inside the query, so
# the driver's weaker rows-only check still has teeth).
# corpus_e2e_pipeline stays in every window as the flagship canary.
# Every entry NOT listed keeps its relative order after the listed
# ones — nothing is ever dropped.
_ROUND_PRIORITY = [
    # --- flagship regression canary (kept in every window) ---
    "corpus_e2e_pipeline",
    # --- the five round-6 additions (never driver-windowed) ---
    "ljung_box_acf_test",
    "cohens_kappa_raters",
    "cusum_mean_shift_daily",
    "rank_biased_overlap_parts",
    "t_closeness_risk",
    # --- functions_ext window/interval-analytics tail ---
    "lag_value_delta",
    "range_frame_hour_sum",
    "dense_hourly_counts",
    "quantile_profile",
    "active_users_dau_wau",
    "user_activity_streaks",
    "twap_daily_value",
    "cohort_retention_matrix",
    "bounce_rate_daily",
    "interpolate_hourly_gaps",
    # --- relational_ext tail ---
    "argmax_aggregates",
    "lateral_topk_orders",
    "null_safe_join_counts",
    "semi_join_discounted_orders",
    "hinted_merge_join_counts",
    "except_intersect_all_bags",
    "pareto_frontier_orders",
    "revenue_pareto_8020",
    "pit_feature_join",
    "share_of_parent_rollup",
    "time_decayed_customer_value",
    "trending_parts_rank_delta",
    # --- sampling / split family ---
    "kfold_cv_assignments",
    "bottomk_uniform_sample",
    "weighted_topk_sample_es",
    "grouped_split_no_leakage",
    "per_source_capped_sample",
    "temporal_split_leakage",
    # --- sketch gates ---
    "hll_distinct_by_type_check",
    "quantile_sketch_by_flag_check",
    "hll_union_mergeability",
    "kmv_jaccard_sources",
    "bloom_fpr_audit",
    "hash_uniformity_chi2",
    "wau_hll_window_merge",
    # --- MLlib rows-only family (self-asserting metric floors) ---
    "ml_tuned_dt_depth",
    "ml_train_gbt_binary",
    "ml_train_lr_binary",
    "ml_train_linreg",
    "ml_train_als_implicit",
    "ml_cv_dt_kfold",
    "ml_isotonic_calibration",
    "ml_conformal_coverage",
    "mllib_fpgrowth_itemsets",
    # --- 50-entry window boundary ---
    # Remaining never-certified backlog (120 after this window — 117
    # pre-round entries + the three r7 privacy additions — all
    # locally oracle-green via tests/test_parity.py — VERDICT r6 ask
    # #6: drain the rest in r8 so every registry entry has a driver
    # row, then flip rotation policy to re-certifying oldest greens).
    # By family: pyapi surface (variant_props_stats, cogroup_asof,
    # arrow_token_bins, udtf_chunk_profile/analyze, observe metrics,
    # pandas-api, parameterized sql, grouped_agg_udf_median,
    # session_variable_threshold, rolling_robust_zscore_flags);
    # graph (kcore, sssp, ppr, assortativity, hits); corpus/text
    # tail (bigram_lm_logloss, psi_split_drift, boilerplate_gram_
    # share, span_mask_augment, nucleus_vocab_coverage, zipf/feature-
    # hash, rake/lexdiv/readability, gopher/c4 filters, kn_bigram_
    # score, corpus_drift_chi2, url_host_stats, text_normalize,
    # collated_token_histogram, lang_id_eval_metrics, quantile_norm,
    # weighted_median_length_by_source, dataset_card_report,
    # bpe_fertility_by_lang, arrow_udf_fingerprint); datamgmt/privacy
    # (compaction, schema evolution, pseudonymize, quarantine,
    # snapshot diff, dynamic-partition-overwrite, k_anonymity_risk,
    # dp_noisy_daily_counts, key_skew_gini, dict encoding, RI/FD
    # audits, partition_plan_advisor); anomaly/session analytics
    # (funnel, transition matrix, MAD outliers, seasonal naive/
    # robust, beaconing, attribution_first_vs_last); streaming tail
    # (restart/state-store, recordlog sinks/ingest); ingest formats
    # (jsonl/orc/xml/binary-file scans); stats second-order tail
    # (rfm, kaplan-meier, revenue_mix, trimmed/rolling/lagged, holt
    # variants, tail_dependence, geo grid ops); relational/window
    # leftovers (salted_user_counts, json_props_stats, multi_
    # distinct_lineitem, value_histogram, orders_by_month, promo_
    # parts_by_brand, window_rank_functions, user_event_sequences,
    # customer_name_features, unpivot, event_time_parts, map/try/
    # bitwise/array profiles, equidepth_histogram gate, event_type_
    # trigrams, dwell_time_by_type, conversion_latency_quantiles,
    # episode_follow_counts, new_vs_returning, interorder_gap);
    # search (hybrid_search_rrf, search_ranking_metrics); trainprep/
    # entity/assoc (length_band_filter, source_temperature_sample,
    # preference_pair_mining, loo_source_ablation, er_golden_records,
    # itemcf, gsp/prefixspan); clustering (dbscan_grid, kcenter_
    # coreset); rangescale gates (exact_percentiles_scaled,
    # winsorized_mean_orders); remaining rows-only MLlib
    # (mllib_minhash_pairs, word2vec_synonyms, pca_embedding_
    # variance); the three r7 privacy additions (l_diversity_entropy,
    # qi_generalization_ladder, dp_stability_histogram — certify
    # beside their r7-windowed siblings in r8).
    #
    # ROUND-8 ROTATION PLAN (for the next builder; verify against
    # CORRECTNESS_r07 before applying): with this window green, 120
    # entries remain — 2.4 windows.  Lead r8 with the graph family,
    # the pyapi surface, the datamgmt/privacy tail (k_anonymity_risk,
    # dp_noisy_daily_counts — certified siblings of the r7-windowed
    # t_closeness_risk), the anomaly/session family, and the corpus/
    # text tail; r9 takes the remainder (ingest formats, streaming
    # tail, stats second-order, relational leftovers), after which
    # rotation re-certifies the oldest greens (r1 entries first).
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
