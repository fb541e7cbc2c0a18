from .tables import (
    FLOW_SCHEMA,
    TABLES,
    canonical_name,
    canonicalize_columns,
    load_table,
    scan_flows,
)
from .sinks import scan_predictions, sink_predictions

__all__ = [
    "FLOW_SCHEMA",
    "TABLES",
    "canonical_name",
    "canonicalize_columns",
    "load_table",
    "scan_flows",
    "scan_predictions",
    "sink_predictions",
]
