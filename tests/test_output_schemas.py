"""Registry-wide Spark output-schema gate (VERDICT r10 ask #2).

The driver canonicalizes EVERY entry's result — oracled entries and
rows-only entries alike — through pandas ``sort_values``, which cannot
hash non-scalar cells.  An ``ArrayType``/``MapType``/``StructType``
output column therefore goes driver-red with ``unhashable type`` even
when the values are bit-identical to the oracle (r7
``mllib_fpgrowth_itemsets``, r10 ``user_event_sequences``).  The
rows-only mimic in ``test_parity.py`` only covered half the surface;
this gate closes the class for the whole registry by asserting, at
plan time (no execution for lazily-built queries), that no registered
query emits a complex-typed output column.

Queries that genuinely compute sequences/sets must scalarize at the
boundary (``F.array_join(..., '|')`` / DuckDB ``array_to_string``),
exactly like ``user_event_sequences`` after the r11 fix.
"""

from __future__ import annotations

from pyspark.sql import types as T

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_no_registered_query_emits_complex_output_columns(spark):
    offenders = []
    for name in sorted(REGISTRY):
        fn, _sql = REGISTRY[name]
        df = fn(spark, SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, _COMPLEX):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, (
        "registered queries emit driver-unhashable complex columns "
        "(scalarize with array_join/to_json at the boundary):\n"
        + "\n".join(f"  {n}.{c}: {t}" for n, c, t in offenders)
    )
