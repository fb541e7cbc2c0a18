"""Every registered query with an oracle must hash-match DuckDB —
the local mirror of the driver's t2 gate (at sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import pytest

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR
from .oracle import compare_query

_WITH_ORACLE = sorted(name for name, (_, sql) in REGISTRY.items() if sql is not None)
_ROWS_ONLY = sorted(name for name, (_, sql) in REGISTRY.items() if sql is None)


def _assert_pandas_canonicalizable(df):
    # Mimic the driver's canonicalizer (pandas sort_values →
    # Categorical): it hashes every output value of EVERY entry —
    # oracled and rows-only alike — so a non-scalar column
    # (array/map/struct) crashes the driver harness with "unhashable
    # type" (r7 mllib_fpgrowth_itemsets, rows-only; r10
    # user_event_sequences, oracled).  Catch that locally: every
    # registered output must pandas-sort cleanly.
    pdf = df.limit(200).toPandas()
    if len(pdf):
        pdf.sort_values(by=list(pdf.columns), kind="stable")


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, name):
    fn, sql = REGISTRY[name]
    df = fn(spark, SF_DIR)
    compare_query(spark, SF_DIR, df, sql)
    _assert_pandas_canonicalizable(df)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    _assert_pandas_canonicalizable(df)
