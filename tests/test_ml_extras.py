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
