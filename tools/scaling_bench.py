#!/usr/bin/env python
"""Empirical scaling measurement for SCALING_EVIDENCE.md (VERDICT r5
ask #3): time a set of registered queries at two scale factors and
record the per-query scaling exponent

    alpha = log(t_big / t_small) / log(rows_big / rows_small)

alpha ≈ 1 → linear in rows, alpha < 1 → sublinear (fixed overheads
amortizing), alpha > 1 → super-linear (a scale smell worth a plan
audit).  Single warm session, per-table warmup at each scale before
timing, queries materialized through the noop sink exactly like
bench.py.

Usage:
    python tools/scaling_bench.py --small /root/testdata/sf0.1 \
        --big /tmp/nids_scaling/sf1.0 --ratio 10 --out /tmp/scaling.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from network_ids_using_pyspark_spark.queries import REGISTRY  # noqa: E402
from network_ids_using_pyspark_spark.session import get_spark  # noqa: E402
from network_ids_using_pyspark_spark.sources.tables import (  # noqa: E402
    TABLES,
    load_table,
)

# Top-20 most expensive queries of the r5 driver sweep
# (BENCH_DETAIL_r05.json) — the judge-named measurement set — plus the
# range-partitioned `_scaled` twins (whose whole point is surviving
# scale), the flagship pipeline, and the skew-targeted operators that
# the generator's hot keys stress on purpose.
DEFAULT_QUERIES = [
    # top-20 by r5 cost
    "ml_train_mlp", "pca_power_iteration_exact", "ml_conformal_coverage",
    "causal_e2e_readout", "blocking_recall_eval", "ml_isotonic_calibration",
    "ml_train_gbt_binary", "markov_attribution_removal", "ml_e2e_ref_width",
    "poisson_bootstrap_ci", "ml_train_lr_binary", "ml_cv_dt_kfold",
    "ml_confusion_rf", "ml_train_dt", "ppr_trade_graph",
    "exact_substring_dup_spans", "lpa_communities_trade_graph",
    "ml_train_linreg", "pagerank_trade_graph", "cluster_keep_best",
    # scale-path twins + flagship
    "corpus_e2e_pipeline",
    "equidepth_histogram_scaled", "snm_candidate_pairs_scaled",
    "rfm_segment_counts_scaled", "learned_binning_apply_scaled",
    "stump_split_gains_scaled", "pareto_frontier_orders_scaled",
    "peak_concurrent_sessions_scaled",
    # skew-sensitive operators (the generator plants ~4.5% hot keys)
    "salted_user_counts", "salted_skew_join_revenue",
    "minhash_lsh_pairs", "cosine_topk_lsh",
]


def _time_query(spark, name: str, sf_dir: str, reps: int = 1) -> tuple[float, list]:
    """Median of ``reps`` runs (ADVICE r6: one-sample exponents near 1.0
    carry visible noise); per-run times are returned so the evidence
    records variance, not just the point estimate."""
    fn, _ = REGISTRY[name]
    runs = []
    for _ in range(max(1, reps)):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    return statistics.median(runs), runs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/nids_scaling/sf1.0")
    ap.add_argument("--ratio", type=float, default=10.0, help="row ratio big/small")
    ap.add_argument("--out", default="/tmp/scaling_bench.json")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3, help="runs per point; median used")
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    spark = get_spark(app_name="scaling-bench")

    def _session_dead() -> bool:
        try:
            return spark.sparkContext._jsc.sc().isStopped()
        except Exception:
            return True

    results: dict[str, dict] = {}
    for sf_dir, key in ((args.small, "t_small"), (args.big, "t_big")):
        for t in TABLES:
            load_table(spark, sf_dir, t).count()  # warmup: file index + JIT
        for name in names:
            try:
                dt, runs = _time_query(spark, name, sf_dir, reps=args.reps)
            except Exception as e:
                print(f"scaling: {name}@{sf_dir} FAILED: {e}", file=sys.stderr)
                dt, runs = -1.0, []
                # A task-level OOM at scale kills the whole local-mode
                # SparkContext; without a restart every LATER query
                # cascades to a phantom -1.0 (exactly how the first r10
                # 30x board lost six measurements to one kNN OOM).
                # Restart the JVM, re-warm the tables, keep going.
                if _session_dead():
                    print(
                        f"scaling: SparkContext died after {name} — "
                        "restarting session and re-warming",
                        file=sys.stderr,
                    )
                    try:
                        spark.stop()
                    except Exception:
                        pass
                    spark = get_spark(app_name="scaling-bench-restarted")
                    for t in TABLES:
                        load_table(spark, sf_dir, t).count()
            results.setdefault(name, {})[key] = dt
            results[name][key + "_runs"] = runs
            print(f"{key} {name}: {dt}s {runs}", flush=True)
    for name, r in results.items():
        ts, tb = r.get("t_small", -1), r.get("t_big", -1)
        r["alpha"] = (
            round(math.log(tb / ts) / math.log(args.ratio), 3)
            if ts > 0 and tb > 0
            else None
        )
        r["ratio"] = round(tb / ts, 2) if ts > 0 and tb > 0 else None
    payload = {
        "small": args.small, "big": args.big, "row_ratio": args.ratio,
        "cpus": os.cpu_count(), "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({k: v["alpha"] for k, v in results.items()}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
