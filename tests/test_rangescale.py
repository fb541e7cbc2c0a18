"""Scale contract + first-principles checks for the rangescale twins
(queries/rangescale.py, operators/rangepart.py) — VERDICT r4 ask #3:
the six global-window queries get scale-safe twins with NO
single-partition window/sort over the raw grain, sharing the exact
forms' oracles."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.rangepart import (
    exact_rank_select,
    ntile_boundaries,
    ntile_sizes,
)
from network_ids_using_pyspark_spark.plans.inspect import count_shuffles, explain_str
from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR

SCALED = [
    "equidepth_histogram_scaled",
    "stump_split_gains_scaled",
    "rfm_segment_counts_scaled",
    "learned_binning_apply_scaled",
    "snm_candidate_pairs_scaled",
    "pareto_frontier_orders_scaled",
    "peak_concurrent_sessions_scaled",
]

# a Window whose child exchange is SinglePartition = the one-task sort
# the twins exist to eliminate (scalar 1-row aggregate finals elsewhere
# in a plan are the legitimate G4 pattern and are NOT matched)
_WIN_SP = re.compile(r"Window[^\n]*\n(?:[^\n]*Sort[^\n]*\n)?[^\n]*Exchange SinglePartition")


def _df(spark, name):
    return REGISTRY[name][0](spark, SF_DIR)


def test_scaled_twins_share_exact_oracles():
    for name in SCALED:
        exact = name.removesuffix("_scaled")
        assert REGISTRY[name][1] == REGISTRY[exact][1], name


def test_no_single_partition_window_in_any_scaled_twin(spark):
    for name in SCALED:
        plan = explain_str(_df(spark, name), "simple")
        assert not _WIN_SP.search(plan), f"{name} has a one-task window:\n{plan}"
        assert "ntile" not in plan, f"{name} still NTILEs in-plan"


def test_exact_stump_no_single_partition_window_downstream(spark):
    # the shared downstream's bucket-grain prefix max is a broadcast
    # triangular join now — the exact twin's ONLY one-task window left
    # is the raw-grain NTILE it exists to gate
    plan = explain_str(_df(spark, "stump_split_gains"), "simple")
    matches = _WIN_SP.findall(plan)
    assert matches  # the raw-grain gate NTILE (re-derived per subplan)
    assert all("ntile" in m for m in matches), matches


def test_equidepth_scaled_is_windowless(spark):
    plan = explain_str(_df(spark, "equidepth_histogram_scaled"), "simple")
    assert "Window" not in plan and "Sort" not in plan


def test_rfm_scaled_single_shuffle_map_side_scoring(spark):
    df = _df(spark, "rfm_segment_counts_scaled")
    plan = explain_str(df, "simple")
    assert "Window" not in plan  # scoring is a map-side CASE
    assert count_shuffles(df) == 1  # only the final 125-cell group-by


def test_binning_scaled_broadcast_probe(spark):
    df = _df(spark, "learned_binning_apply_scaled")
    plan = explain_str(df, "simple")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 10-row range probe
    assert count_shuffles(df) == 1


def test_snm_pareto_windows_are_bucket_partitioned(spark):
    for name in (
        "snm_candidate_pairs_scaled",
        "pareto_frontier_orders_scaled",
        "peak_concurrent_sessions_scaled",
    ):
        plan = explain_str(_df(spark, name), "formatted")
        # the per-bucket window shuffles on bkt, never to one task
        assert "hashpartitioning(bkt" in plan, name


def test_peak_scaled_equals_exact_twin(spark):
    a = [tuple(r) for r in _df(spark, "peak_concurrent_sessions").collect()]
    b = [tuple(r) for r in _df(spark, "peak_concurrent_sessions_scaled").collect()]
    assert a == b


# ---------------------------------------------------------------------------
# first-principles checks of the primitive itself
# ---------------------------------------------------------------------------


def test_ntile_arithmetic_matches_definition():
    assert ntile_sizes(10, 4) == [3, 3, 2, 2]
    assert ntile_boundaries(10, 4) == [3, 6, 8, 10]
    assert ntile_sizes(7, 7) == [1] * 7
    assert sum(ntile_sizes(1001, 16)) == 1001


def test_exact_rank_select_matches_python_sort(spark):
    rng = random.Random(42)
    data = [(rng.uniform(-100, 100), i) for i in range(5000)]
    # heavy ties to force tiebreak narrowing on the second column
    data += [(7.5, 100000 + i) for i in range(3000)]
    df = spark.createDataFrame(data, "v double, k long")
    truth = sorted(data)
    n = len(data)
    ranks = [1, 2, 17, n // 3, n // 2, n - 1, n]
    got = exact_rank_select(df, ["v", "k"], ranks, bins=16, small=64)
    for r in ranks:
        assert got[r] == truth[r - 1], r


def test_exact_rank_select_single_column_with_duplicates(spark):
    vals = [float(x) for x in [5, 1, 3, 3, 3, 9, 7, 1, 5, 3]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    truth = sorted(vals)
    got = exact_rank_select(df, ["v"], list(range(1, 11)), bins=4, small=2)
    assert [got[r][0] for r in range(1, 11)] == truth


def test_equidepth_scaled_equals_exact_twin(spark):
    a = _df(spark, "equidepth_histogram").collect()
    b = _df(spark, "equidepth_histogram_scaled").collect()
    key = lambda r: r["bin"]  # noqa: E731
    assert sorted([tuple(r) for r in a], key=lambda t: t[0]) == sorted(
        [tuple(r) for r in b], key=lambda t: t[0]
    )


def test_snm_scaled_equals_exact_twin(spark):
    a = {tuple(r) for r in _df(spark, "snm_candidate_pairs").collect()}
    b = {tuple(r) for r in _df(spark, "snm_candidate_pairs_scaled").collect()}
    assert a == b


def test_pareto_scaled_equals_exact_twin(spark):
    a = {tuple(r) for r in _df(spark, "pareto_frontier_orders").collect()}
    b = {tuple(r) for r in _df(spark, "pareto_frontier_orders_scaled").collect()}
    assert a == b


def test_exact_percentiles_matches_python(spark):
    import pyarrow.parquet as pq

    v = sorted(pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"]).column(0).to_pylist())
    import math as _m

    rows = {r["p"]: r for r in _df(spark, "exact_percentiles_scaled").collect()}
    n = len(v)
    for p in (0.5, 0.9, 0.99, 0.999):
        rk = _m.ceil(p * n)
        assert rows[p]["rk"] == rk
        assert rows[p]["value"] == v[rk - 1]


def test_winsorized_mean_matches_python(spark):
    import math as _m

    import pyarrow.parquet as pq

    v = sorted(pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"]).column(0).to_pylist())
    n = len(v)
    lo, hi = v[_m.ceil(0.01 * n) - 1], v[_m.ceil(0.99 * n) - 1]
    mean = sum(min(hi, max(lo, x)) for x in v) / n
    r = _df(spark, "winsorized_mean_orders").collect()[0]
    assert (r["n"], r["cap_lo"], r["cap_hi"]) == (n, lo, hi)
    assert r["n_clamped_lo"] == sum(1 for x in v if x < lo)
    assert r["n_clamped_hi"] == sum(1 for x in v if x > hi)
    assert abs(r["mean_winsorized"] - mean) < 1e-4


def test_exact_rank_select_degenerate_edges(spark):
    # all-identical values: the tiebreak column resolves the rank
    df = spark.createDataFrame([(1.0, i) for i in range(10000)], "v double, k long")
    got = exact_rank_select(df, ["v", "k"], [1, 5000, 10000], bins=8, small=256)
    assert got[1] == (1.0, 0) and got[5000] == (1.0, 4999) and got[10000] == (1.0, 9999)
    # all-identical, single column: bounded fallback resolve
    assert exact_rank_select(df.select("v"), ["v"], [3], bins=8, small=256)[3] == (1.0,)
    # n smaller than the grid
    df2 = spark.createDataFrame([(float(x),) for x in [9, 1, 5]], "v double")
    got = exact_rank_select(df2, ["v"], [1, 2, 3], bins=1024, small=1)
    assert [got[r][0] for r in (1, 2, 3)] == [1.0, 5.0, 9.0]
    # extreme magnitudes keep the grid arithmetic finite
    import random as _random

    rng = _random.Random(7)
    data = [(rng.choice([-1e300, -1.5, 0.0, 2.5, 1e300]),) for _ in range(5000)]
    truth = sorted(v for (v,) in data)
    got = exact_rank_select(
        spark.createDataFrame(data, "v double"), ["v"], [1, 2500, 5000], bins=16, small=64
    )
    assert [got[r][0] for r in (1, 2500, 5000)] == [truth[0], truth[2499], truth[4999]]
    # rank bounds enforced
    import pytest as _pytest

    with _pytest.raises(ValueError):
        exact_rank_select(df2, ["v"], [0])


def test_exact_rank_select_constant_task_is_o1(spark):
    # An all-tied single-column relation larger than _MAX_RESOLVE_ROWS:
    # the old degenerate-tie fallback collected the whole task (and
    # raised past 5M rows); the constant-task path now fetches ONE row,
    # because a task whose last sort column is natively constant carries
    # the same tuple in every row (the descent invariant).
    from pyspark.sql import functions as F

    big = spark.range(6_000_000).select(F.lit(7.25).alias("v"))
    got = exact_rank_select(big, ["v"], [1, 3_000_000, 6_000_000], bins=8, small=256)
    assert got == {1: (7.25,), 3_000_000: (7.25,), 6_000_000: (7.25,)}


def test_exact_rank_select_double_collapsed_natives(spark):
    # int64 values above 2^53 are distinct natively but identical after
    # the double cast, so the grid's min/max width is 0 even though the
    # column is NOT constant.  Advancing to the tiebreak column here
    # narrows under a non-lexicographic order (the r7 ADVICE repro:
    # rank 1 returned (2^53+1, 0) instead of (2^53, 2)); the fix
    # detects native lo != hi and exact-resolves the bounded remainder.
    big = 2**53
    data = [(big + 1, 0), (big + 1, 1), (big, 2), (big, 3)]
    df = spark.createDataFrame(data, "v long, tb long")
    truth = sorted(data)
    got = exact_rank_select(df, ["v", "tb"], [1, 2, 3, 4], bins=8, small=2)
    assert [got[r] for r in (1, 2, 3, 4)] == truth
    # same shape with more rows so the descent actually recurses before
    # hitting the collapsed level (small < cnt at level 1)
    data2 = [(big + (i % 2), i) for i in range(2000)]
    df2 = spark.createDataFrame(data2, "v long, tb long")
    truth2 = sorted(data2)
    got2 = exact_rank_select(df2, ["v", "tb"], [1, 1000, 1001, 2000], bins=8, small=64)
    assert [got2[r] for r in (1, 1000, 1001, 2000)] == [
        truth2[0], truth2[999], truth2[1000], truth2[1999]
    ]
    # genuinely constant first column still advances to the tiebreak
    # (no needless full resolve): behavior identical to before the fix
    df3 = spark.createDataFrame([(1.0, i) for i in range(5000)], "v double, k long")
    got3 = exact_rank_select(df3, ["v", "k"], [1, 2500, 5000], bins=8, small=128)
    assert [got3[r] for r in (1, 2500, 5000)] == [(1.0, 0), (1.0, 2499), (1.0, 4999)]
