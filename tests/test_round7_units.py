"""Round-7 unit tests: the privacy additions' mathematical invariants
(beyond the oracle parity that test_parity.py already gives them) and
the directory-layout streaming-source fix."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR


def _run(spark, name):
    fn, _ = REGISTRY[name]
    return fn(spark, SF_DIR)


class TestEntropyLDiversity:
    def test_entropy_bounds(self, spark):
        """0 <= H <= ln(#bands in class) <= ln(class domain); the
        min/max columns must respect the Shannon bounds (allowing the
        decimal-truncation epsilon around 0)."""
        rows = _run(spark, "l_diversity_entropy").collect()
        assert rows
        for r in rows:
            assert r.min_entropy >= -1e-6
            assert r.max_entropy <= math.log(24 * 60) + 1e-6
            assert r.min_entropy <= r.max_entropy
            assert 0 <= r.n_risky_classes <= r.n_classes

    def test_risky_iff_below_ln_l(self, spark):
        """Cross-check the risky count against a direct recomputation
        from the class/band relation."""
        from network_ids_using_pyspark_spark.sources.tables import load_table

        cb = (
            load_table(spark, SF_DIR, "events")
            .groupBy(
                "event_type",
                F.hour("ts").alias("qh"),
                F.floor(F.col("value") / 50).cast("long").alias("qv"),
            )
            .count()
        ).collect()
        from collections import defaultdict

        classes: dict = defaultdict(list)
        for r in cb:
            classes[(r.event_type, r.qh)].append(r["count"])
        risky: dict = defaultdict(int)
        for (et, _), counts in classes.items():
            n = sum(counts)
            h = math.log(n) - sum(c * math.log(c) for c in counts) / n
            if h < math.log(3):
                risky[et] += 1
        got = {r.event_type: r.n_risky_classes for r in _run(spark, "l_diversity_entropy").collect()}
        assert got == dict(risky)


class TestGeneralizationLadder:
    def test_monotone_in_level(self, spark):
        """Coarsening can only merge classes: n_classes is
        non-increasing and min_class_n non-decreasing in the level."""
        rows = sorted(_run(spark, "qi_generalization_ladder").collect(), key=lambda r: r.level)
        assert [r.level for r in rows] == [1, 2, 4, 8]
        for a, b in zip(rows, rows[1:]):
            assert b.n_classes <= a.n_classes
            assert b.min_class_n >= a.min_class_n
        for r in rows:
            assert r.meets_k == (r.min_class_n >= 5)
            assert (r.n_risky_classes == 0) == (r.min_class_n >= 5)

    def test_level1_matches_kanon_grain(self, spark):
        """Level 1 is exactly the k_anonymity_risk QI grid, so its
        totals must agree with that query's per-type rollup."""
        lv1 = next(r for r in _run(spark, "qi_generalization_ladder").collect() if r.level == 1)
        kan = _run(spark, "k_anonymity_risk").collect()
        assert lv1.n_classes == sum(r.n_classes for r in kan)
        assert lv1.n_risky_classes == sum(r.n_risky_classes for r in kan)
        assert lv1.n_risky_rows == sum(r.n_risky_rows for r in kan)


class TestStabilityHistogram:
    def test_released_cells_clear_tau(self, spark):
        tau = 1.0 + 2.0 * math.log(2.0 / 1e-6)
        rows = _run(spark, "dp_stability_histogram").collect()
        for r in rows:
            assert r.noisy_n > tau - 1e-6
            assert abs(r.noisy_n - r.true_n) < 40  # Laplace(1) tail at md5 uniform
        # ranks are 1..k per type, dense
        from collections import defaultdict

        per_type = defaultdict(list)
        for r in rows:
            per_type[r.event_type].append(r.released_rank)
        for ranks in per_type.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))

    def test_release_is_reproducible(self, spark):
        a = {(r.event_type, r.qh): r.noisy_n for r in _run(spark, "dp_stability_histogram").collect()}
        b = {(r.event_type, r.qh): r.noisy_n for r in _run(spark, "dp_stability_histogram").collect()}
        assert a == b


class TestStreamDirectoryLayout:
    def test_directory_layout_streams_rows(self, spark, tmp_path):
        """A Spark-written events table (directory of part files) must
        stream the same row count as the single-file fixture layout —
        the r7 regression fix (pathGlobFilter matched leaf files only
        and silently streamed zero rows)."""
        from network_ids_using_pyspark_spark.sources.tables import load_table
        from network_ids_using_pyspark_spark.streaming.stream import (
            run_to_memory,
            stream_events,
        )

        out = str(tmp_path / "sfdir")
        ev = load_table(spark, SF_DIR, "events")
        ev.write.parquet(f"{out}/events.parquet")
        streamed = run_to_memory(
            stream_events(spark, out).groupBy().count(), "complete"
        ).collect()[0][0]
        assert streamed == ev.count() > 0


class TestBatchedRankSelect:
    """Round-7 rewrite: exact_rank_select batches each narrowing level
    into one min/max scan + one histogram scan (the per-task recursion
    went super-linear at 30x rows).  Exactness vs a brute-force sort,
    under heavy ties, lexicographic tiebreaks, and a tiny `small` that
    forces a deep descent."""

    def test_adversarial_exactness(self, spark):
        import random

        from network_ids_using_pyspark_spark.operators.rangepart import (
            exact_rank_select,
        )

        random.seed(7)
        rows = [
            (random.choice([1.5, 2.5, 2.5, 2.5, 9.0, -3.0]), random.randrange(10**6))
            for _ in range(5000)
        ]
        df = spark.createDataFrame(rows, "v double, tb long")
        ranks = [1, 7, 500, 2500, 3333, 4999, 5000]
        got = exact_rank_select(df, ["v", "tb"], ranks, bins=16, small=32)
        truth = sorted(rows)
        assert {r: got[r] for r in ranks} == {r: tuple(truth[r - 1]) for r in ranks}

    def test_constant_column_resolves(self, spark):
        from network_ids_using_pyspark_spark.operators.rangepart import (
            exact_rank_select,
        )

        df = spark.createDataFrame([(4.2,)] * 1000, "v double")
        got = exact_rank_select(df, ["v"], [1, 500, 1000], bins=8, small=16)
        assert all(v == (4.2,) for v in got.values())
