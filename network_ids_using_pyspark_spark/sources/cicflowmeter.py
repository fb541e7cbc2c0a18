"""Canonical CICFlowMeter-v3 80-column schema.

This is the exact inferred schema the reference pays a full extra scan
to discover on every run (``inferSchema=True``, ``modelling.py:50``) —
captured once from the notebook's printSchema output
(``ISAA_Review_3.ipynb:434-514, cell 20``) and pinned, so real
CIC-IDS-2018 day-files load with zero inference cost and no type drift
between files.  Use ``scan_flows(..., schema=CICFLOWMETER_SCHEMA)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# (name, spark type) in file order; i=int, l=long, d=double, s=string
_COLS: list[tuple[str, str]] = [
    ("Dst Port", "i"), ("Protocol", "i"), ("Timestamp", "s"),
    ("Flow Duration", "l"), ("Tot Fwd Pkts", "i"), ("Tot Bwd Pkts", "i"),
    ("TotLen Fwd Pkts", "i"), ("TotLen Bwd Pkts", "i"),
    ("Fwd Pkt Len Max", "i"), ("Fwd Pkt Len Min", "i"),
    ("Fwd Pkt Len Mean", "d"), ("Fwd Pkt Len Std", "d"),
    ("Bwd Pkt Len Max", "i"), ("Bwd Pkt Len Min", "i"),
    ("Bwd Pkt Len Mean", "d"), ("Bwd Pkt Len Std", "d"),
    ("Flow Byts/s", "d"), ("Flow Pkts/s", "d"),
    ("Flow IAT Mean", "d"), ("Flow IAT Std", "d"),
    ("Flow IAT Max", "l"), ("Flow IAT Min", "l"),
    ("Fwd IAT Tot", "l"), ("Fwd IAT Mean", "d"), ("Fwd IAT Std", "d"),
    ("Fwd IAT Max", "l"), ("Fwd IAT Min", "l"),
    ("Bwd IAT Tot", "i"), ("Bwd IAT Mean", "d"), ("Bwd IAT Std", "d"),
    ("Bwd IAT Max", "i"), ("Bwd IAT Min", "i"),
    ("Fwd PSH Flags", "i"), ("Bwd PSH Flags", "i"),
    ("Fwd URG Flags", "i"), ("Bwd URG Flags", "i"),
    ("Fwd Header Len", "i"), ("Bwd Header Len", "i"),
    ("Fwd Pkts/s", "d"), ("Bwd Pkts/s", "d"),
    ("Pkt Len Min", "i"), ("Pkt Len Max", "i"),
    ("Pkt Len Mean", "d"), ("Pkt Len Std", "d"), ("Pkt Len Var", "d"),
    ("FIN Flag Cnt", "i"), ("SYN Flag Cnt", "i"), ("RST Flag Cnt", "i"),
    ("PSH Flag Cnt", "i"), ("ACK Flag Cnt", "i"), ("URG Flag Cnt", "i"),
    ("CWE Flag Count", "i"), ("ECE Flag Cnt", "i"),
    ("Down/Up Ratio", "i"), ("Pkt Size Avg", "d"),
    ("Fwd Seg Size Avg", "d"), ("Bwd Seg Size Avg", "d"),
    ("Fwd Byts/b Avg", "i"), ("Fwd Pkts/b Avg", "i"),
    ("Fwd Blk Rate Avg", "i"), ("Bwd Byts/b Avg", "i"),
    ("Bwd Pkts/b Avg", "i"), ("Bwd Blk Rate Avg", "i"),
    ("Subflow Fwd Pkts", "i"), ("Subflow Fwd Byts", "i"),
    ("Subflow Bwd Pkts", "i"), ("Subflow Bwd Byts", "i"),
    ("Init Fwd Win Byts", "i"), ("Init Bwd Win Byts", "i"),
    ("Fwd Act Data Pkts", "i"), ("Fwd Seg Size Min", "i"),
    ("Active Mean", "d"), ("Active Std", "d"),
    ("Active Max", "i"), ("Active Min", "i"),
    ("Idle Mean", "d"), ("Idle Std", "d"),
    ("Idle Max", "l"), ("Idle Min", "l"),
    ("Label", "s"),
]

_TYPES = {
    "i": T.IntegerType(),
    "l": T.LongType(),
    "d": T.DoubleType(),
    "s": T.StringType(),
}

CICFLOWMETER_SCHEMA = T.StructType(
    [T.StructField(name, _TYPES[t]) for name, t in _COLS]
)

# All 78 numeric feature columns — the VectorAssembler input set the
# reference derives as columns[:-2] (modelling.py:95-96)
CICFLOWMETER_FEATURES = [
    name for name, t in _COLS if t in ("i", "l", "d") and name != "Label"
]
