from .stream import (
    run_to_memory,
    sliding_counts,
    session_stats,
    stream_events,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "run_to_memory",
    "sliding_counts",
    "session_stats",
    "stream_events",
    "stream_dedup",
    "tumbling_counts",
]
