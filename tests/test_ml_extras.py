"""Invariant tests for the rows-only ML additions of the continuation
session (isotonic calibration)."""

from __future__ import annotations

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_isotonic_calibration_invariants(spark):
    rows = sorted(
        REGISTRY["ml_isotonic_calibration"][0](spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert rows, "empty calibration table"
    assert all(0 <= r.decile <= 9 for r in rows)
    assert all(0.0 <= r.mean_p_cal <= 1.0 for r in rows)
    assert all(0.0 <= r.pos_rate <= 1.0 for r in rows)
    # the calibrated map is monotone non-decreasing in the raw score,
    # so decile means must be non-decreasing too
    cals = [r.mean_p_cal for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(cals, cals[1:]))
    # raw means strictly increase across deciles by construction
    raws = [r.mean_p_raw for r in rows]
    assert all(a < b for a, b in zip(raws, raws[1:]))
    # calibration actually separates: bottom decile near 0 positives,
    # top decile near all positives (the LR is strong on this task)
    assert rows[0].pos_rate < 0.1 and rows[-1].pos_rate > 0.9


def test_conformal_coverage_invariants(spark):
    rows = {
        r.alpha: r
        for r in REGISTRY["ml_conformal_coverage"][0](spark, SF_DIR).collect()
    }
    assert set(rows) == {0.10, 0.05}
    for alpha, r in rows.items():
        assert 0.0 < r.qhat < 1.0
        assert r.n_cal > 100 and r.n_test > 100
        # marginal guarantee holds in expectation; allow finite-sample
        # slack of 3 binomial standard errors on this fixed split
        import math

        slack = 3 * math.sqrt(alpha * (1 - alpha) / r.n_test)
        assert r.coverage >= 1 - alpha - slack, (alpha, r.coverage)
        assert 0.0 < r.mean_set_size <= 2.0
    # smaller alpha → larger (or equal) threshold and sets
    assert rows[0.05].qhat >= rows[0.10].qhat
    assert rows[0.05].mean_set_size >= rows[0.10].mean_set_size - 1e-9
