"""Local mirror of the driver's DuckDB-oracle comparison.

Stricter than (or equal to) the driver: row count, column-name set, and
an order-insensitive exact value comparison with floats compared by
bit pattern (the engine is *designed* for bit-exact parity — see
functions/numeric.py and functions/hashing.py).
"""

from __future__ import annotations

import datetime
import math
import struct
from decimal import Decimal

import duckdb

from network_ids_using_pyspark_spark.sources.tables import TABLES


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _canon(v):
    if v is None:
        return ("n",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", struct.pack("<d", v).hex())
    if isinstance(v, Decimal):
        return ("f", struct.pack("<d", float(v)).hex())
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("s", str(v))


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, sf_dir: str, spark_df, sql: str) -> None:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    o_cols, o_rows = run_oracle(sf_dir, sql)
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"
    sn = normalize(s_cols, s_rows)
    on = normalize(o_cols, o_rows)
    if sn != on:
        diff_s = [r for r in sn if r not in set(on)][:3]
        diff_o = [r for r in on if r not in set(sn)][:3]
        raise AssertionError(
            f"value mismatch\n spark-only: {diff_s}\n oracle-only: {diff_o}"
        )
