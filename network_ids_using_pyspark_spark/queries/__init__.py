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
# (registration order).  Rounds 1-7 windowed 341 distinct entries
# (CORRECTNESS_r01-r07.json; zero oracle mismatches ever recorded —
# the only non-null ``err`` values are the driver's ``no_oracle``
# marker on by-design rows-only entries, plus r7's
# mllib_fpgrowth_itemsets canonicalizer crash, fixed and re-windowed
# below).  Round 8's window executes VERDICT r7 ask #1: rotate onto
# 48 more never-certified entries per the staged plan — the graph
# family (kcore/sssp/ppr/assortativity + hits), the pyapi surface,
# the datamgmt/privacy tail (k_anonymity_risk and dp_noisy_daily_
# counts beside the three r7 privacy additions), the anomaly/session
# family, and the corpus/text tail.  corpus_e2e_pipeline stays in
# every window as the flagship canary; mllib_fpgrowth_itemsets is
# re-windowed per VERDICT r7 ask #2 (items now stringified so the
# driver's rows-only canonicalizer can hash it).  Every entry NOT
# listed keeps its relative order after the listed ones — nothing is
# ever dropped.
_ROUND_PRIORITY = [
    # --- flagship regression canary (kept in every window) ---
    "corpus_e2e_pipeline",
    # --- r7 red row, fixed: re-certify first (VERDICT r7 ask #2) ---
    "mllib_fpgrowth_itemsets",
    # --- graph family (incl. HITS, its quality_ext sibling) ---
    "kcore_decomposition",
    "sssp_cheapest_reach",
    "ppr_trade_graph",
    "degree_assortativity_trade_graph",
    "hits_hub_authority",
    # --- pyapi surface ---
    "variant_props_stats",
    "cogroup_asof_stats",
    "arrow_token_bins",
    "udtf_chunk_profile",
    "udtf_analyze_top_tokens",
    "observed_scan_metrics",
    "pandas_api_event_profile",
    "parameterized_sql_top_priorities",
    "grouped_agg_udf_median",
    "session_variable_threshold",
    "rolling_robust_zscore_flags",
    # --- datamgmt/privacy tail (siblings of r7's t_closeness_risk) ---
    "k_anonymity_risk",
    "dp_noisy_daily_counts",
    "l_diversity_entropy",
    "qi_generalization_ladder",
    "dp_stability_histogram",
    # --- anomaly / session analytics family ---
    "funnel_click_to_purchase",
    "event_transition_matrix",
    "value_outliers_mad",
    "seasonal_naive_wape",
    "seasonal_robust_anomaly",
    "attribution_first_vs_last",
    "beaconing_periodicity_detection",
    # --- corpus tail ---
    "corpus_drift_chi2",
    "url_host_stats",
    "text_normalize_profile",
    "bigram_lm_logloss",
    "psi_split_drift",
    "boilerplate_gram_share",
    "span_mask_augment",
    "nucleus_vocab_coverage",
    "quantile_norm_report",
    "weighted_median_length_by_source",
    "dataset_card_report",
    # --- text tail ---
    "arrow_udf_fingerprint",
    "collated_token_histogram",
    "feature_hash_profile",
    "zipf_fit_report",
    "rake_keyword_extraction",
    "lang_id_eval_metrics",
    "lexical_diversity_by_source",
    "readability_by_source",
    # --- corpus/text quality tail (1 slot left in the window) ---
    "gopher_quality_filter",
    # --- 50-entry window boundary ---
    # Remaining never-certified backlog after this window: 74 entries
    # (~1.5 windows; 72 pre-round + the r8 additions pii_scan_report
    # and stop_shingle_profile), all locally oracle-green via
    # tests/test_parity.py (full-registry sf0.01 sweep re-run green
    # late in r8 after the df-split dedup rewrite).
    # By family: ingest formats (jsonl/orc/xml/binary-file scans,
    # stream_recordlog_ingest); streaming tail (restart/state-store,
    # recordlog sink); functions_ext leftovers (json_props_stats,
    # multi_distinct_lineitem, value_histogram, orders_by_month,
    # promo_parts_by_brand, window_rank_functions, user_event_
    # sequences, customer_name_features, unpivot, event_time_parts,
    # map/try/bitwise/array profiles, equidepth_histogram gate,
    # event_type_trigrams, dwell_time_by_type, conversion_latency_
    # quantiles, episode_follow_counts); datamgmt (compaction, schema
    # evolution, pseudonymize, quarantine, snapshot diff, dynamic-
    # partition-overwrite, key_skew_gini, dict encoding, RI/FD
    # audits, partition_plan_advisor); stats second-order tail (rfm,
    # kaplan-meier, revenue_mix, trimmed/rolling/lagged, holt
    # variants, tail_dependence); rangescale gates (exact_
    # percentiles_scaled, winsorized_mean_orders); geo grid ops;
    # relational leftovers (salted_user_counts, new_vs_returning,
    # interorder_gap); search (hybrid_search_rrf, search_ranking_
    # metrics); trainprep/entity/assoc (length_band_filter, source_
    # temperature_sample, preference_pair_mining, loo_source_
    # ablation, er_golden_records, itemcf, gsp/prefixspan);
    # clustering (dbscan_grid, kcenter_coreset); quality_ext tail
    # (c4_line_filter_report, kn_bigram_score); tokenizer
    # (bpe_fertility_by_lang); remaining rows-only MLlib
    # (mllib_minhash_pairs, word2vec_synonyms, pca_embedding_
    # variance).
    #
    # ROUND-9 ROTATION PLAN (for the next builder; verify against
    # CORRECTNESS_r08 before applying): with this window green, the 72
    # remaining never-certified entries need ~1.5 windows; lead r9
    # with all 72 minus the canary slot's cost — i.e. the window takes
    # the first 49 by family (ingest, streaming tail, functions_ext
    # leftovers, datamgmt), r10 takes the last ~23 and starts
    # RE-certifying the oldest greens (VERDICT r7 ask #6: the r1
    # certifications predate the current AQE/shuffle/warmup config —
    # rotate them back through, oldest first).
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
