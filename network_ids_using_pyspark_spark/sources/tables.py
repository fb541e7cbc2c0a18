"""Table scans.

The reference ingests CICFlowMeter CSVs with ``inferSchema=True``
(``/root/reference/src/modelling.py:50``), paying an extra full scan per
file and risking type drift between files.  The engine instead pins an
explicit ``StructType`` (CSV is accepted only at the ingest edge) and
standardizes on Parquet — columnar, statistics-bearing, vectorized-read —
which is what the driver's fixture tables already are (``TESTDATA.md``).

Column names in the reference contain spaces and ``/`` (e.g.
``Flow Byts/s``, ``ISAA_Review_3.ipynb:444``); ``canonicalize_columns``
renames them to snake_case at the boundary and keeps the reverse map so
reference-shaped files still round-trip.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The driver's fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Compact analog of the 80-column CICFlowMeter-v3 schema the reference
# infers (full printSchema captured at ISAA_Review_3.ipynb:434-514).
# One column per distinct type/behavior class, per FIXTURES.md §1.
FLOW_SCHEMA = T.StructType(
    [
        T.StructField("flow_id", T.LongType()),
        T.StructField("Dst Port", T.IntegerType()),
        T.StructField("Protocol", T.IntegerType()),
        T.StructField("Timestamp", T.StringType()),  # 'dd/MM/yyyy HH:mm:ss'
        T.StructField("Flow Duration", T.LongType()),
        T.StructField("Tot Fwd Pkts", T.IntegerType()),
        T.StructField("TotLen Fwd Pkts", T.IntegerType()),
        T.StructField("Fwd Pkt Len Mean", T.DoubleType()),
        T.StructField("Flow Byts/s", T.DoubleType()),
        T.StructField("Flow Pkts/s", T.DoubleType()),
        T.StructField("Flow IAT Mean", T.DoubleType()),
        T.StructField("SYN Flag Cnt", T.IntegerType()),
        T.StructField("ACK Flag Cnt", T.IntegerType()),
        T.StructField("Down/Up Ratio", T.IntegerType()),
        T.StructField("Init Fwd Win Byts", T.IntegerType()),
        T.StructField("Label", T.StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table.  Parquet → vectorized read, predicate
    pushdown and column pruning come free from Catalyst.

    Timestamp normalization: fixture files have stored timestamps as
    TIMESTAMP(NANOS) (read as long via the legacy conf, ns → µs) and as
    TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    TIMESTAMP_NTZ.  Either way every temporal column is normalized to a
    UTC-instant TimestampType: the session timezone is pinned to UTC, so
    the NTZ→LTZ cast is value-preserving and matches DuckDB's naive-
    timestamp `epoch_us` semantics exactly.  Functions like
    `unix_micros`/`window`/watermarks then work uniformly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if (
            isinstance(field.dataType, T.LongType)
            and field.name == "ts"
            and name == "events"
        ):
            # integer ns → µs (DIV keeps it in exact int64 arithmetic)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def scan_flows(
    spark: SparkSession,
    paths: str | list[str],
    fmt: str = "csv",
    canonicalize: bool = True,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Engine op ``scan_flows`` (SURVEY.md §2.1 A1).

    Multi-file scan of flow records with a *pinned* schema — never
    ``inferSchema`` (anti-pattern at ``modelling.py:50``).  A list of
    paths is a union-all of homogeneous files, handled by the scan node
    itself (no driver-side loop).  Pass
    ``sources.cicflowmeter.CICFLOWMETER_SCHEMA`` to load real
    CIC-IDS-2018 day-files at reference width (80 columns).
    """
    if fmt == "csv":
        df = spark.read.schema(schema or FLOW_SCHEMA).csv(paths, header=True)
    elif fmt == "parquet":
        df = spark.read.parquet(*(paths if isinstance(paths, list) else [paths]))
    else:
        raise ValueError(f"unsupported format: {fmt}")
    return canonicalize_columns(df) if canonicalize else df


def canonical_name(name: str) -> str:
    """``Flow Byts/s`` → ``flow_byts_per_s``; ``Down/Up Ratio`` →
    ``down_per_up_ratio``.  Deterministic, collision-checked by caller."""
    out = name.strip().replace("/", " per ")
    out = re.sub(r"[^0-9a-zA-Z]+", "_", out).strip("_").lower()
    return out


def canonicalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column to snake_case (SURVEY.md §1.4).  Pure
    metadata — no job, no shuffle."""
    mapping = {c: canonical_name(c) for c in df.columns}
    if len(set(mapping.values())) != len(mapping):
        raise ValueError(f"canonicalization collision in {sorted(df.columns)}")
    return df.withColumnsRenamed(mapping)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format most LLM-data pipelines
    speak.  Parquet stays the engine-internal format (columnar, stats,
    pruning); JSONL is for the boundary."""
    df.write.mode(mode).json(path)


def scan_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSONL scan with a MANDATORY explicit schema — never inferSchema
    (the reference's inferSchema=True costs a full extra pass and lets
    types drift between files, SURVEY.md §4.2)."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar format Spark ships a vectorized
    reader for; interchange with Hive-ecosystem consumers."""
    df.write.mode(mode).orc(path)


def scan_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
